"""Step-4a IsoformMatrix end-to-end tests on synthetic refFlat + BAM."""
import json

import numpy as np
import pytest

from sicelore_tpu.core.longread import LongreadParser
from sicelore_tpu.core.molecule import MoleculeDataset
from sicelore_tpu.core.refflat import RefFlatModel
from sicelore_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from sicelore_tpu.pipeline.isoform import isoform_matrix

# Gene layout on chr1 (0-based refFlat coords):
#   GENEA TRA1: exons (100-200) (300-400) (500-600)   junctions (200,301),(400,501)
#   GENEA TRA2: exons (100-200) (500-600)             junction  (200,501)
#   GENEB TRB1: exon  (1000-1200)  (mono-exonic, single transcript)
REFFLAT = """\
GENEA\tTRA1\tchr1\t+\t100\t600\t100\t600\t3\t100,300,500,\t200,400,600,
GENEA\tTRA2\tchr1\t+\t100\t600\t100\t600\t2\t100,500,\t200,600,
GENEB\tTRB1\tchr1\t+\t1000\t1200\t1000\t1200\t1\t1000,\t1200,
"""


def aligned_rec(name, bc, umi, gene, exons_0based, shift=0, mapq=60,
                de=0.05, extra_cigar=None):
    """Build a BamRecord whose CIGAR reproduces the given genomic exons.

    exons_0based: [(start0, end0_exclusive)] as in refFlat; junctions then
    match the transcript's (end, start+1) 1-based convention.
    """
    cigar = []
    pos0 = exons_0based[0][0] + shift
    prev_end = None
    qlen = 0
    for (s, e) in exons_0based:
        s, e = s + shift, e + shift
        if prev_end is not None:
            cigar.append(("N", s - prev_end))
        cigar.append(("M", e - s))
        qlen += e - s
        prev_end = e
    seq = "A" * qlen
    return BamRecord(qname=name, flag=0, ref_id=0, pos=pos0, mapq=mapq,
                     cigar=cigar, seq=seq, qual=b"\x28" * qlen,
                     tags=[("BC", "Z", bc), ("U8", "Z", umi),
                           ("GE", "Z", gene), ("de", "f", de)])


@pytest.fixture()
def bam_and_refflat(tmp_path):
    refflat = tmp_path / "model.refFlat"
    refflat.write_text(REFFLAT)
    header = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])
    tra1 = [(100, 200), (300, 400), (500, 600)]
    tra2 = [(100, 200), (500, 600)]
    trb1 = [(1000, 1200)]
    recs = [
        # molecule CELL1:UMI1 -> two reads matching TRA1 exactly
        aligned_rec("r1", "CELL1", "UMI1", "GENEA", tra1),
        aligned_rec("r2", "CELL1", "UMI1", "GENEA", tra1, shift=1),  # within DELTA
        # molecule CELL1:UMI2 -> matches TRA2
        aligned_rec("r3", "CELL1", "UMI2", "GENEA", tra2),
        # molecule CELL2:UMI3 -> junctions off by 10 -> undef
        aligned_rec("r4", "CELL2", "UMI3", "GENEA",
                    [(100, 210), (310, 400), (510, 600)]),
        # molecule CELL2:UMI4 -> mono-exonic GENEB -> auto-assign TRB1
        aligned_rec("r5", "CELL2", "UMI4", "GENEB", trb1),
        # unauthorized cell -> excluded from matrix
        aligned_rec("r6", "CELLX", "UMI5", "GENEA", tra1),
        # no barcode -> dropped by parser
        BamRecord(qname="r7", flag=0, ref_id=0, pos=100, mapq=60,
                  cigar=[("M", 50)], seq="A" * 50, qual=b"\x28" * 50,
                  tags=[("GE", "Z", "GENEA"), ("U8", "Z", "UMIX")]),
        # chimeric (clip > 150) -> dropped
        aligned_rec("r8", "CELL1", "UMI6", "GENEA", tra2, extra_cigar=None),
    ]
    recs[-1].cigar = [("S", 200)] + recs[-1].cigar
    recs[-1].seq = "A" * (200 + recs[-1].query_length() - 200)
    recs[-1].seq = "A" * recs[-1].query_length()
    recs[-1].qual = b"\x28" * len(recs[-1].seq)
    bam = tmp_path / "in.bam"
    with BamWriter(bam, header) as w:
        for r in recs:
            w.write(r)
    csv = tmp_path / "cells.csv"
    csv.write_text("CELL1-1\nCELL2-1\n")
    return bam, refflat, csv


def test_refflat_model(tmp_path):
    refflat = tmp_path / "m.refFlat"
    refflat.write_text(REFFLAT)
    model = RefFlatModel.load(refflat)
    assert len(model) == 3
    tra1 = model.select_one("GENEA", "TRA1")
    assert tra1.exons == [(101, 200), (301, 400), (501, 600)]
    assert tra1.junctions.tolist() == [[200, 301], [400, 501]]
    assert model.select_one("GENEB", "TRB1").junctions.shape == (0, 2)


def test_longread_parser_filters(bam_and_refflat):
    bam, _, _ = bam_and_refflat
    p = LongreadParser(bam)
    assert p.stats.total_records == 8
    assert p.stats.null_records == 1       # r7 no BC
    assert p.stats.chimeria_records == 1   # r8 clip 200
    assert p.stats.valid_records == 6
    r1 = p.reads["r1"].records[0]
    assert r1.junctions.tolist() == [[200, 301], [400, 501]]
    assert r1.tx_start == 101 and r1.tx_end == 600


def test_isoform_matrix_end_to_end(bam_and_refflat, tmp_path):
    bam, refflat, csv = bam_and_refflat
    out = tmp_path / "out"
    log = isoform_matrix(bam, refflat, csv, out, prefix="t", isobam=True,
                         tobulk=True)
    assert log["molecules"] == 5  # r1+r2 share CELL1:UMI1
    assert log["monoexon"] == 1
    assert log["onematch"] >= 3
    assert log["nomatch"] == 1

    iso = (out / "t_isomatrix.txt").read_text().strip().split("\n")
    header = iso[0].split("\t")
    assert header == ["geneId", "transcriptId", "nbExons", "CELL1", "CELL2"]
    rows = {tuple(l.split("\t")[:2]): l.split("\t")[3:] for l in iso[1:]}
    assert rows[("GENEA", "TRA1")] == ["1", "0"]
    assert rows[("GENEA", "TRA2")] == ["1", "0"]
    assert rows[("GENEA", "undef")] == ["0", "1"]
    assert rows[("GENEB", "TRB1")] == ["0", "1"]

    gene = (out / "t_genematrix.txt").read_text().strip().split("\n")
    grows = {l.split("\t")[0]: l.split("\t")[1:] for l in gene[1:]}
    assert grows["GENEA"] == ["2", "1"]
    assert grows["GENEB"] == ["0", "1"]

    cm = (out / "t_cellmetrics.txt").read_text().strip().split("\n")
    assert cm[1].startswith("CELL1\t3\t1\t2\t2\t0")
    assert cm[2].startswith("CELL2\t2\t2\t2\t1\t1")

    junc = (out / "t_juncmatrix.txt").read_text().strip().split("\n")
    juncrows = {l.split("\t")[0] for l in junc[1:]}
    assert "GENEA:200-301" in juncrows and "GENEA:400-501" in juncrows

    # ISOBAM: IG/IT tags present on every record
    with BamReader(out / "t_isobam.bam") as rd:
        tags = {r.qname: (r.get_tag("IG"), r.get_tag("IT")) for r in rd}
    assert tags["r1"] == ("GENEA", "TRA1")
    assert tags["r5"] == ("GENEB", "TRB1")
    assert tags["r4"] == ("GENEA", "undef")
    assert tags["r7"] == ("undef", "undef")

    logj = json.loads((out / "t.log").read_text())
    assert logj["isoform_undef"] == 1
