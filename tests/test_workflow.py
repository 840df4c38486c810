"""SAM codec + end-to-end workflow orchestration tests.

The workflow test stubs the minimap2 stage by pre-creating the sorted BAM
(resume semantics skip it) — the whole orchestration from raw fastq to
isoform matrices runs on synthetic data.
"""
import gzip
import json

import numpy as np
import pytest

from sicelore_tpu.io import sam
from sicelore_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from sicelore_tpu.pipeline import readname
from sicelore_tpu.pipeline.workflow import run_pipeline
from sicelore_tpu.utils import dna, synth


def test_sam_roundtrip(tmp_path):
    samtxt = (
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chr1\tLN:1000\n"
        "r1\t0\tchr1\t100\t60\t5S20M100N10M\t*\t0\t0\t" + "A" * 35 + "\t"
        + "I" * 35 + "\tBC:Z:ACGT\tNM:i:2\tde:f:0.05\tXB:B:c,1,-2\n"
        "r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII\n")
    (tmp_path / "t.sam").write_text(samtxt)
    n = sam.sam_to_bam(tmp_path / "t.sam", tmp_path / "t.bam")
    assert n == 2
    with BamReader(tmp_path / "t.bam") as rd:
        recs = list(rd)
        assert rd.header.refs == [("chr1", 1000)]
    assert recs[0].qname == "r1" and recs[0].pos == 99
    assert recs[0].cigar == [("S", 5), ("M", 20), ("N", 100), ("M", 10)]
    assert recs[0].get_tag("BC") == "ACGT"
    assert recs[0].get_tag("XB") == [1, -2]
    assert abs(recs[0].get_tag("de") - 0.05) < 1e-6
    assert recs[1].is_unmapped
    # and back to SAM
    n = sam.bam_to_sam(tmp_path / "t.bam", tmp_path / "back.sam")
    assert n == 2
    back = (tmp_path / "back.sam").read_text()
    assert "r1\t0\tchr1\t100\t60\t5S20M100N10M" in back
    assert "BC:Z:ACGT" in back


@pytest.mark.slow
def test_workflow_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    wl = synth.make_whitelist(rng, 64)
    cells = wl[:6]
    # raw fastq
    fq = tmp_path / "fastq_pass"
    fq.mkdir()
    reads = []
    with gzip.open(fq / "r.fastq.gz", "wb") as fh:
        for i in range(150):
            c = cells[int(rng.integers(0, 6))]
            r = synth.make_read(rng, c, cdna_len=300, error_rate=0.04,
                                reverse=bool(i % 2))
            fh.write(b"@rd%d\n" % i + r["seq"] + b"\n+\n" + r["qual"] + b"\n")
    wl_file = tmp_path / "wl.txt"
    wl_file.write_text("".join(w + "\n" for w in wl))
    (tmp_path / "model.refFlat").write_text(
        "GENE1\tTR1\tchr1\t+\t1000\t2000\t1000\t2000\t1\t1000,\t2000,\n")
    (tmp_path / "ref.fa").write_text(">chr1\n" + "A" * 100 + "\n")
    out = tmp_path / "out"

    # stage 1 only: an EXPLICIT missing minimap2 path still fails the
    # align stage (the silent native fallback applies only to the
    # default tool name), leaving the resume point for the faked BAM
    with pytest.raises(RuntimeError, match="minimap2 not found"):
        run_pipeline(fq, tmp_path / "ref.fa", tmp_path / "model.refFlat",
                     out, whitelist=wl_file, log=lambda *a: None,
                     minimap2_path=str(tmp_path / "no-such-minimap2"))

    # fake the aligner output from the scanfastq result (resume picks it up)
    header = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])
    from sicelore_tpu.io import fastq as fqio
    recs = []
    for f in sorted((out / "readscan" / "passed").glob("*.fastq*")):
        for ch in fqio.read_fastq(f):
            for nm, s, q in zip(ch.names, ch.seqs, ch.quals):
                info = readname.parse_name(nm)
                cs, ce = (info.tso_end or 0) + 1, info.ps
                recs.append(BamRecord(
                    qname=nm.decode(), flag=0, ref_id=0,
                    pos=1000 + int(rng.integers(0, 30)), mapq=60,
                    cigar=[("S", cs), ("M", max(ce - cs, 30)),
                           ("S", len(s) - cs - max(ce - cs, 30))],
                    seq=s.decode(), qual=bytes(x - 33 for x in q),
                    tags=[("de", "f", 0.05)]))
    recs.sort(key=lambda r: r.pos)
    with BamWriter(out / "passed.sorted.bam", header) as w:
        for r in recs:
            w.write(r)

    res = run_pipeline(fq, tmp_path / "ref.fa", tmp_path / "model.refFlat",
                       out, whitelist=wl_file, with_consensus=True,
                       log=lambda *a: None)
    assert (out / "isomatrix" / "sicelore_isomatrix.txt").exists()
    assert (out / "genecounts.tsv").exists()
    assert (out / "consensus.fastq").exists()
    assert (out / "molecules.fastq").exists()
    assert res["umi"]["umi_assigned"] > 100
    iso = (out / "isomatrix" / "sicelore_isomatrix.txt").read_text()
    assert iso.startswith("geneId\ttranscriptId")
    # resume: rerunning skips everything (results empty)
    res2 = run_pipeline(fq, tmp_path / "ref.fa", tmp_path / "model.refFlat",
                        out, whitelist=wl_file, with_consensus=True,
                        log=lambda *a: None)
    assert "umi" not in res2
