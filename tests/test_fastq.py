"""Fastq I/O round-trip tests (sicelore_tpu.io.fastq)."""
import gzip

from sicelore_tpu.io import fastq


def _write(path, records, gz=False):
    data = b"".join(b"@" + n + (b" " + c if c else b"") + b"\n" + s + b"\n+\n" + q + b"\n"
                    for n, c, s, q in records)
    if gz:
        with gzip.open(path, "wb") as fh:
            fh.write(data)
    else:
        path.write_bytes(data)


RECS = [
    (b"read1", b"runid=7 ch=1", b"ACGTACGT", b"IIIIIIII"),
    (b"read2", b"", b"GGGG", b"!!!!"),
    (b"read3", b"x", b"TTTTTTTTTT", b"JJJJJJJJJJ"),
]


def test_read_plain_and_gz(tmp_path):
    _write(tmp_path / "a.fastq", RECS)
    _write(tmp_path / "b.fq.gz", RECS, gz=True)
    for f in ("a.fastq", "b.fq.gz"):
        chunks = list(fastq.read_fastq(tmp_path / f, chunk_size=2))
        assert [len(c) for c in chunks] == [2, 1]
        names = [n for c in chunks for n in c.names]
        seqs = [s for c in chunks for s in c.seqs]
        assert names == [b"read1", b"read2", b"read3"]
        assert seqs == [b"ACGTACGT", b"GGGG", b"TTTTTTTTTT"]
        assert chunks[0].comments[0] == b"runid=7 ch=1"


def test_discovery_and_dirs(tmp_path):
    (tmp_path / "sub").mkdir()
    _write(tmp_path / "a.fastq", RECS[:1])
    _write(tmp_path / "sub" / "b.fastq.gz", RECS[1:], gz=True)
    (tmp_path / "notme.txt").write_bytes(b"hi")
    files = fastq.find_fastq_files(tmp_path)
    assert [f.name for f in files] == ["a.fastq", "b.fastq.gz"]
    reads = [n for c in fastq.read_fastq_dirs([tmp_path]) for n in c.names]
    assert reads == [b"read1", b"read2", b"read3"]


def test_writer_roundtrip(tmp_path):
    out = tmp_path / "passed" / "out.fastq"
    with fastq.FastqWriter(out) as w:
        for n, c, s, q in RECS:
            w.write(n, s, q, c)
    back = list(fastq.read_fastq(out))[0]
    assert back.names == [r[0] for r in RECS]
    assert back.quals == [r[3] for r in RECS]


def test_load_fastq_dict(tmp_path):
    _write(tmp_path / "a.fastq", RECS)
    d = fastq.load_fastq_dict(tmp_path)
    assert d[b"read2"] == (b"GGGG", b"!!!!")
