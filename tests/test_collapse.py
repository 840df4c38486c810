"""Step-7 CollapseModel tests: novel-isoform discovery on synthetic isobam."""
import json

import numpy as np
import pytest

from sicelore_tpu.io.bam import BamHeader, BamRecord, BamWriter
from sicelore_tpu.io.bed import BedModel
from sicelore_tpu.pipeline.collapsemodel import collapse_model

REFFLAT = """\
GENEA\tTRA1\tchr1\t+\t100\t600\t100\t600\t3\t100,300,500,\t200,400,600,
"""
# known junctions: (200,301),(400,501); splice sites {200,301,400,501}


def _rec(name, bc, umi, ig, it, exons, rn=2):
    cigar = []
    prev = None
    qlen = 0
    for (s, e) in exons:
        if prev is not None:
            cigar.append(("N", s - prev))
        cigar.append(("M", e - s))
        qlen += e - s
        prev = e
    return BamRecord(qname=name, flag=0, ref_id=0, pos=exons[0][0], mapq=60,
                     cigar=cigar, seq="A" * qlen, qual=b"\x28" * qlen,
                     tags=[("BC", "Z", bc), ("U8", "Z", umi),
                           ("IG", "Z", ig), ("IT", "Z", it),
                           ("RN", "i", rn), ("CS", "Z", "ACGT" * (qlen // 4)),
                           ("de", "f", 0.05)])


@pytest.fixture()
def setup(tmp_path):
    refflat = tmp_path / "model.refFlat"
    refflat.write_text(REFFLAT)
    cells = tmp_path / "cells.csv"
    cells.write_text("CELL1-1\nCELL2-1\n")
    bam = tmp_path / "isobam.bam"
    header = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])
    # novel exon-skipping isoform: junction (200, 501) — combination of
    # known splicesites; 3 molecules of evidence
    novel_exons = [(100, 200), (500, 600)]
    # novel isoform with an entirely novel splice site: junction (200, 451)
    novel2_exons = [(100, 200), (450, 600)]
    recs = [
        _rec("k1", "CELL1", "U1", "GENEA", "TRA1",
             [(100, 200), (300, 400), (500, 600)]),
        _rec("n1", "CELL1", "U2", "GENEA", "undef", novel_exons),
        _rec("n2", "CELL1", "U3", "GENEA", "undef", novel_exons),
        _rec("n3", "CELL2", "U4", "GENEA", "undef", novel_exons),
        _rec("x1", "CELL2", "U5", "GENEA", "undef", novel2_exons),  # 1 ev
    ]
    with BamWriter(bam, header) as w:
        for r in recs:
            w.write(r)
    return bam, refflat, cells, tmp_path


def test_collapse_model(setup):
    bam, refflat, cells, tmp = setup
    stats = collapse_model(bam, refflat, cells, tmp / "out", prefix="cm")
    # the 3-evidence novel isoform survives MINEVIDENCE=2; the singleton not
    assert stats["novel_in_catalog_count"] == 1
    assert stats["combination_of_known_splicesites_count"] == 1
    assert stats["gencode_count"] == 1
    assert stats["isoforms"] == 2
    txt = (tmp / "out" / "cm.txt").read_text().strip().split("\n")
    rows = {l.split("\t")[1]: l.split("\t") for l in txt[1:]}
    assert "TRA1" in rows
    novel_id = [k for k in rows if k.startswith("Novel.")][0]
    r = rows[novel_id]
    assert r[9] == "novel_in_catalog"
    assert r[10] == "combination_of_known_splicesites"
    assert r[7] == "3"  # UMIs
    assert r[11] == "200-501"  # the novel junction
    # refflat export round-trips through our parser
    flat = (tmp / "out" / "cm.refflat.txt").read_text().strip().split("\n")
    assert len(flat) == 2
    gff = (tmp / "out" / "cm.gff").read_text()
    assert 'category "novel_in_catalog"' in gff


def test_collapse_model_with_validation(setup, tmp_path):
    bam, refflat, cells, tmp = setup
    # CAGE peak at novel tx start (100), polyA at end (600): + strand
    cage = tmp_path / "cage.bed"
    cage.write_text("chr1\t99\t110\tp\t0\t+\n")
    polya = tmp_path / "polya.bed"
    polya.write_text("chr1\t590\t600\tp\t0\t+\n")
    # short-read BAM supporting junction (200, 501)
    short = tmp_path / "short.bam"
    header = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])
    with BamWriter(short, header) as w:
        for i in range(5):
            w.write(BamRecord(qname=f"s{i}", flag=0, ref_id=0, pos=180,
                              cigar=[("M", 20), ("N", 300), ("M", 20)],
                              seq="A" * 40, qual=b"\x28" * 40, mapq=60))
    stats = collapse_model(bam, refflat, cells, tmp / "outv", prefix="cm",
                           cage_bed=cage, polya_bed=polya, short_bam=short)
    assert stats["combination_of_known_splicesites_count_valid"] == 1
    txt = (tmp / "outv" / "cm.txt").read_text().strip().split("\n")
    novel = [l.split("\t") for l in txt[1:]
             if l.split("\t")[1].startswith("Novel.")][0]
    assert novel[12] == "5"       # junction support reads
    assert novel[13] == "true"    # junctions valid
    assert novel[18] == "true"    # overall valid
    validgff = (tmp / "outv" / "cm_valid.gff").read_text()
    assert "Novel." in validgff


def test_bed_distance(tmp_path):
    bed = tmp_path / "x.bed"
    bed.write_text("chr1\t99\t110\tp\t0\t+\nchr1\t200\t260\tp\t0\t-\n")
    m = BedModel.load(bed)
    # + strand anchor = start0+1 = 100; convention: value negated on +
    assert m.distance("chr1", "+", 100) == 0
    assert m.distance("chr1", "+", 95) == 5
    assert m.distance("chr1", "+", 105) == -5
    # - strand anchor = end = 260
    assert m.distance("chr1", "-", 250) == -10
    assert m.distance("chr2", "+", 100) == 2**31 - 1