"""BAI index writer + region query (samtools-index role).

Reference dependency being replaced: htsjdk indexed queries in
SNPMatrix.java:138-141 and UCSCRefFlatParser.java:138-208.
"""
import numpy as np
import pytest

from sicelore_tpu.io.bam import (BamHeader, BamRecord, BamWriter,
                                 IndexedBamReader, build_bai, load_bai,
                                 sort_bam)

HDR = BamHeader("@SQ\tSN:chr1\tLN:2000000\n@SQ\tSN:chr2\tLN:2000000\n",
                [("chr1", 2_000_000), ("chr2", 2_000_000)])


def _make_bam(tmp_path, n=3000, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        rid = int(rng.integers(0, 2))
        pos = int(rng.integers(0, 1_900_000))
        ln = int(rng.integers(50, 5000))
        recs.append(BamRecord(qname=f"r{i}", flag=0, ref_id=rid, pos=pos,
                              mapq=60, cigar=[("M", ln)], seq="A" * ln,
                              qual=b"\x28" * ln, tags=[("XI", "i", i)]))
    recs.sort(key=lambda r: (r.ref_id, r.pos))
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        for r in recs:
            w.write(r)
    return p, recs


def test_fetch_matches_stream_filter(tmp_path):
    p, recs = _make_bam(tmp_path)
    rd = IndexedBamReader(p)  # builds .bai on demand
    assert (tmp_path / "in.bam.bai").exists()
    for chrom, start, end in (("chr1", 100_000, 120_000),
                              ("chr2", 0, 5_000),
                              ("chr1", 1_890_000, 2_000_000),
                              ("chr2", 500_000, 500_001)):
        rid = 0 if chrom == "chr1" else 1
        want = [r.get_tag("XI") for r in recs
                if r.ref_id == rid and r.pos < end
                and r.pos + r.reference_length() > start]
        got = [r.get_tag("XI") for r in rd.fetch(chrom, start, end)]
        assert got == want, (chrom, start, end)
    # empty region + unknown chromosome
    assert list(rd.fetch("chr1", 1_999_999, 2_000_000)) == []
    assert list(rd.fetch("chrX", 0, 1000)) == []
    rd.close()


def test_bai_roundtrip_and_sorted_check(tmp_path):
    p, _ = _make_bam(tmp_path, n=500, seed=1)
    bai = build_bai(p)
    refs = load_bai(bai)
    assert len(refs) == 2
    assert all(isinstance(b, dict) for b, _ in refs)
    # unsorted input must be rejected
    unsorted = tmp_path / "u.bam"
    with BamWriter(unsorted, HDR) as w:
        w.write(BamRecord(qname="a", flag=0, ref_id=0, pos=100, mapq=60,
                          cigar=[("M", 10)], seq="A" * 10, qual=b"\x28" * 10))
        w.write(BamRecord(qname="b", flag=0, ref_id=0, pos=50, mapq=60,
                          cigar=[("M", 10)], seq="A" * 10, qual=b"\x28" * 10))
    with pytest.raises(ValueError):
        build_bai(unsorted)
    # sort then index works
    sort_bam(unsorted, tmp_path / "s.bam")
    build_bai(tmp_path / "s.bam")
