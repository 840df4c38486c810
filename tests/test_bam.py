"""BAM/BGZF codec round-trip tests."""
import numpy as np

from sicelore_tpu.io import bgzf
from sicelore_tpu.io.bam import (BamHeader, BamReader, BamRecord, BamWriter,
                                 sort_bam)


def test_bgzf_roundtrip(tmp_path):
    data = bytes(np.random.default_rng(0).integers(0, 256, 300_000,
                                                   dtype=np.uint8))
    p = tmp_path / "x.bgzf"
    with bgzf.BGZFWriter(p) as w:
        w.write(data)
    with bgzf.BGZFReader(p) as r:
        back = r.read(len(data) + 100)
    assert back == data
    # EOF marker present
    assert p.read_bytes().endswith(bgzf.BGZF_EOF)


def test_bgzf_virtual_seek(tmp_path):
    p = tmp_path / "x.bgzf"
    with bgzf.BGZFWriter(p) as w:
        offs = []
        for i in range(5):
            offs.append(w.tell_virtual())
            w.write(bytes([i]) * 100_000)
    with bgzf.BGZFReader(p) as r:
        r.seek_virtual(offs[3])
        assert r.read(10) == bytes([3]) * 10


def _mkrec(**kw):
    base = dict(qname="read1", flag=0, ref_id=0, pos=100, mapq=60,
                cigar=[("S", 5), ("M", 20), ("N", 100), ("M", 10), ("S", 3)],
                seq="ACGTACGTACGTACGTACGTACGTACGTACGTACGTAC",
                qual=bytes(range(38)),
                tags=[("BC", "Z", "ACGTACGTACGTACGT"), ("U8", "Z", "TTTTGGGGCCCC"),
                      ("NM", "i", 3), ("de", "f", 0.05),
                      ("XA", "A", "c"), ("XB", "Bc", [-1, 2, 3])])
    base.update(kw)
    return BamRecord(**base)


def test_bam_record_roundtrip(tmp_path):
    header = BamHeader("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:1000000\n",
                       [("chr1", 1000000), ("chr2", 500)])
    recs = [_mkrec(),
            _mkrec(qname="read2", flag=16, pos=500, cigar=[("M", 38)]),
            BamRecord(qname="unmapped", flag=4, seq="ACGT", qual=b"\x10" * 4)]
    p = tmp_path / "t.bam"
    with BamWriter(p, header) as w:
        for r in recs:
            w.write(r)
    with BamReader(p) as rd:
        assert rd.header.refs == header.refs
        assert rd.header.text == header.text
        back = list(rd)
    assert len(back) == 3
    r0 = back[0]
    assert r0.qname == "read1" and r0.pos == 100 and r0.mapq == 60
    assert r0.cigar == [("S", 5), ("M", 20), ("N", 100), ("M", 10), ("S", 3)]
    assert r0.seq.startswith("ACGTACGT") and len(r0.seq) == 38
    assert r0.qual == bytes(range(38))
    assert r0.get_tag("BC") == "ACGTACGTACGTACGT"
    assert r0.get_tag("NM") == 3
    assert abs(r0.get_tag("de") - 0.05) < 1e-6
    assert r0.get_tag("XA") == "c"
    assert r0.get_tag("XB") == [-1, 2, 3]
    assert r0.reference_length() == 130
    assert r0.reference_end() == 230
    assert r0.clip_left() == 5 and r0.clip_right() == 3
    assert back[2].is_unmapped and back[2].qual == b"\x10" * 4


def test_bam_sort(tmp_path):
    header = BamHeader("", [("chr1", 10_000), ("chr2", 10_000)])
    rng = np.random.default_rng(1)
    recs = []
    for i in range(500):
        recs.append(BamRecord(qname=f"r{i}", flag=0,
                              ref_id=int(rng.integers(0, 2)),
                              pos=int(rng.integers(0, 9000)),
                              cigar=[("M", 10)], seq="ACGTACGTAC",
                              qual=b"\x20" * 10))
    recs.append(BamRecord(qname="un", flag=4, seq="AC", qual=b"\x20\x20"))
    p, ps = tmp_path / "u.bam", tmp_path / "s.bam"
    with BamWriter(p, header) as w:
        for r in recs:
            w.write(r)
    sort_bam(p, ps, max_in_mem=100)  # force spill + merge
    with BamReader(ps) as rd:
        back = list(rd)
    assert len(back) == 501
    keys = [(r.ref_id if r.ref_id >= 0 else 1 << 30, r.pos) for r in back]
    assert keys == sorted(keys)
    assert back[-1].qname == "un"
