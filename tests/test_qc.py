"""QC program tests (histo, saturation, stats, bulk2fake)."""
import json

import numpy as np

from sicelore_tpu.io import fastq
from sicelore_tpu.io.bam import BamHeader, BamRecord, BamWriter
from sicelore_tpu.pipeline import qc, readname

HDR = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])


def _bam(tmp_path, recs):
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        for r in recs:
            w.write(r)
    return p


def test_histo_readlength_fastq(tmp_path):
    with open(tmp_path / "r.fastq", "wb") as fh:
        for i, n in enumerate([100, 200, 300]):
            fh.write(b"@r%d\n" % i + b"A" * n + b"\n+\n" + b"I" * n + b"\n")
    r = qc.histo("readlength", tmp_path / "r.fastq", tmp_path / "h")
    assert r["n"] == 3 and r["mean"] == 200
    assert (tmp_path / "h.tsv").exists()
    assert "<svg" in (tmp_path / "h.html").read_text()


def test_histo_umidepth_and_stats(tmp_path):
    recs = [BamRecord(qname=f"r{i}", flag=0, ref_id=0, pos=100 + i, mapq=60,
                      cigar=[("M", 10)], seq="ACGTACGTAC",
                      qual=b"\x1e" * 10,
                      tags=[("RN", "i", i + 1), ("BC", "Z", "X"),
                            ("U8", "Z", f"U{i}")])
            for i in range(5)]
    p = _bam(tmp_path, recs)
    r = qc.histo("umidepth", p, tmp_path / "h2")
    assert r["n"] == 5 and r["mean"] == 3.0
    st = qc.read_bam_stats(p, tmp_path / "stats.json")
    assert st["records"] == 5 and st["with_BC"] == 5
    assert json.loads((tmp_path / "stats.json").read_text())["records"] == 5


def test_saturation_curve(tmp_path):
    recs = [BamRecord(qname=f"r{i}", flag=0, ref_id=0, pos=100, mapq=60,
                      cigar=[("M", 4)], seq="ACGT", qual=b"\x1e" * 4,
                      tags=[("BC", "Z", "C"), ("U8", "Z", f"U{i}"),
                            ("RN", "i", 4)])
            for i in range(10)]
    p = _bam(tmp_path, recs)
    r = qc.saturation_curve(p, tmp_path / "sat")
    assert r["molecules"] == 10 and r["reads"] == 40
    assert abs(r["saturation"] - 0.75) < 1e-6
    lines = (tmp_path / "sat.tsv").read_text().strip().split("\n")
    # at fraction 1.0 expected UMIs == all molecules
    assert abs(float(lines[-1].split("\t")[2]) - 10.0) < 1e-6


def test_bulk2fake(tmp_path):
    with open(tmp_path / "in.fastq", "wb") as fh:
        fh.write(b"@b1\n" + b"ACGT" * 30 + b"\n+\n" + b"I" * 120 + b"\n")
    r = qc.bulk2fake_single_cell(tmp_path / "in.fastq",
                                 tmp_path / "out.fastq")
    assert r == {"reads": 1}
    ch = list(fastq.read_fastq(tmp_path / "out.fastq"))[0]
    info = readname.parse_name(ch.names[0])
    assert info is not None and info.bc == "AAAACCCCGGGGTTTT"


def test_export_edit_distances(tmp_path):
    recs = [BamRecord(qname="r0", flag=0, ref_id=0, pos=1, mapq=60,
                      cigar=[("M", 4)], seq="ACGT", qual=b"\x1e" * 4,
                      tags=[("B1", "i", 1), ("U1", "i", 0)])]
    p = _bam(tmp_path, recs)
    r = qc.export_edit_distances(p, tmp_path / "ed.tsv")
    assert r == {"exported": 1}
    assert "r0\t1\t\t0\t" in (tmp_path / "ed.tsv").read_text()
