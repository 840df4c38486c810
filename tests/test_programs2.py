"""Second utility-program batch tests."""
import numpy as np

from sicelore_tpu.io import fastq
from sicelore_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from sicelore_tpu.pipeline import programs2

HDR = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])


def _rec(name, tags=None, mapq=60, seq="ACGTACGTAC"):
    return BamRecord(qname=name, flag=0, ref_id=0, pos=100, mapq=mapq,
                     cigar=[("M", len(seq))], seq=seq,
                     qual=bytes([30]) * len(seq), tags=tags or [])


def _bam(tmp_path, recs, name="in.bam"):
    p = tmp_path / name
    with BamWriter(p, HDR) as w:
        for r in recs:
            w.write(r)
    return p


def test_select_valid_cell_barcode(tmp_path):
    tsv = tmp_path / "ba.tsv"
    tsv.write_text("barcode\tnReads\tED0\tED1\tED2\n"
                   "AAAA\t100\t80\t20\t0\n"      # ratio 4 -> kept
                   "CCCC\t100\t8\t92\t0\n"       # int div 0 -> dropped
                   "GGGG\t2\t2\t0\t0\n"          # ED1->1, ratio 2, low UMI
                   "TTTT\t50\t50\t0\t0\n")       # ED1->1 ratio 50 -> kept
    r = programs2.select_valid_cell_barcode(tsv, tmp_path / "out.csv",
                                            min_umi=10, ed0ed1_ratio=1.0)
    assert r == {"total_barcodes": 4, "kept_barcodes": 2}
    assert (tmp_path / "out.csv").read_text() == "AAAA\nTTTT\n"


def test_filters_and_tags(tmp_path):
    recs = [_rec("r0", mapq=0),
            _rec("r1=extra_stuff",
                 tags=[("BC", "Z", "X"), ("U8", "Z", "U"),
                       ("RN", "i", 3), ("IT", "Z", "TR1"),
                       ("US", "Z", "AAAA"), ("QS", "Z", "IIII")]),
            _rec("r2", tags=[("BC", "Z", "X"), ("RN", "i", 1),
                             ("IT", "Z", "undef")])]
    p = _bam(tmp_path, recs)
    # FilterBamMF (FilterBamMF.java:49-66): cell-list filter + 10x retag
    (tmp_path / "cells.csv").write_text("X-1\n")
    assert programs2.filter_bam_mf(p, tmp_path / "a.bam",
                                   tmp_path / "cells.csv")["kept"] == 2
    with BamReader(tmp_path / "a.bam") as rd:
        out = list(rd)
    assert [r.qname for r in out] == ["r1", "r2"]  # name cut at "="
    assert out[0].get_tag("CB") == "X-1" and out[0].get_tag("UB") == "U"
    assert programs2.filter_molecule_bam(
        p, tmp_path / "b.bam", min_rn=2, require_isoform=True)["kept"] == 1
    assert programs2.export_umifound_records(
        p, tmp_path / "c.bam")["kept"] == 1
    # CleanUSUQ (CleanUSUQ.java:45-47): tags kept, value -> ""
    programs2.clean_usuq(p, tmp_path / "d.bam")
    with BamReader(tmp_path / "d.bam") as rd:
        rr = list(rd)
    assert rr[1].get_tag("US") == "" and rr[1].get_tag("UQ") == ""
    assert rr[1].get_tag("QS") == "IIII"  # untouched (reference keeps QS)
    # AddLabel2Barcode (AddLabel2Barcode.java:60-61): BC -> BC-LABEL
    programs2.add_label_to_barcode(p, tmp_path / "e.bam", "S1")
    with BamReader(tmp_path / "e.bam") as rd:
        tags = [r.get_tag("BC") for r in rd]
    assert tags == ["null-S1", "X-S1", "X-S1"]
    assert programs2.molecule_counter(p)["molecules"] == 1


def test_split_and_export(tmp_path):
    recs = [_rec(f"r{i}", tags=[("BC", "Z", f"C{i%2}"), ("U8", "Z", f"U{i}"),
                                ("US", "Z", "ACGT" * 5),
                                ("QS", "Z", "I" * 20)])
            for i in range(4)]
    p = _bam(tmp_path, recs)
    # SplitBam (SplitBam.java:49-77): "@" stripped, match on name prefix
    # before "_", yes.bam AND no.bam written
    p2 = _bam(tmp_path, recs + [_rec("r1_GENE_BC")], "in2.bam")
    (tmp_path / "ids.txt").write_text("@r1\nr3\n\n")
    r = programs2.split_bam(p2, tmp_path / "sb", tmp_path / "ids.txt")
    assert r == {"records": 5, "yes": 3, "no": 2}
    with BamReader(tmp_path / "sb" / "yes.bam") as rd:
        assert [x.qname for x in rd] == ["r1", "r3", "r1_GENE_BC"]
    with BamReader(tmp_path / "sb" / "no.bam") as rd:
        assert [x.qname for x in rd] == ["r0", "r2"]
    (tmp_path / "clusters.csv").write_text("C0,alpha\nC1,beta\n")
    r = programs2.split_bam_per_cluster(p, tmp_path / "cl",
                                        tmp_path / "clusters.csv")
    assert r == {"written": 4, "clusters": 2}
    assert (tmp_path / "cl" / "cluster_alpha.bam").exists()
    (tmp_path / "mols.csv").write_text("C0,U0\n")
    r = programs2.export_molecule_reads(p, tmp_path / "mols.csv",
                                        tmp_path / "m.fastq")
    assert r == {"exported": 1}
    ch = list(fastq.read_fastq(tmp_path / "m.fastq"))[0]
    assert ch.names == [b"r0_C0_U0"]


def test_add_reads_to_molecules_and_haplo(tmp_path):
    std = _bam(tmp_path, [_rec("s1", tags=[("BC", "Z", "C"), ("U8", "Z", "U"),
                                           ("IG", "Z", "G"),
                                           ("IT", "Z", "T1"),
                                           ("CS", "Z", "ACGTACGT")])], "s.bam")
    tgt = _bam(tmp_path, [_rec("t1", tags=[("BC", "Z", "C"),
                                           ("U8", "Z", "U")]),
                          _rec("t2", tags=[("BC", "Z", "C"),
                                           ("U8", "Z", "OTHER")])], "t.bam")
    r = programs2.add_reads_to_molecules(std, tgt, tmp_path / "m.bam")
    assert r == {"standard": 1, "added_targeted": 1}
    r = programs2.haplotype_caller(std, tmp_path / "hap")
    assert r == {"isoforms": 1, "sequences": 1}
    assert (tmp_path / "hap" / "G_T1.fa").read_text() == ">C-U\nACGTACGT\n"


def test_export_metrics(tmp_path):
    # ExportMetrics.java:53-128: molecule rows cell/umi/gene/nb_read with
    # distinct read names per molecule; cell rows union read names over the
    # cell's molecules; "-1" stripped; gene defaults to "nogene"
    recs = [_rec("r0", tags=[("CB", "Z", "C0-1"), ("UB", "Z", "U0"),
                             ("GN", "Z", "G1")]),
            _rec("r0", tags=[("CB", "Z", "C0-1"), ("UB", "Z", "U0"),
                             ("GN", "Z", "G1")]),  # same read name -> dedup
            _rec("r1", tags=[("CB", "Z", "C0"), ("UB", "Z", "U0"),
                             ("GN", "Z", "G2")]),  # last gene wins
            _rec("r2", tags=[("CB", "Z", "C0"), ("UB", "Z", "U1")]),  # nogene
            _rec("r3", tags=[("CB", "Z", "C1"), ("UB", "Z", "U2"),
                             ("GN", "Z", "G1")]),
            _rec("r4", tags=[("CB", "Z", "BAD"), ("UB", "Z", "U9")]),
            _rec("r5", tags=[("CB", "Z", "C0")])]  # no UMI -> skipped
    p = _bam(tmp_path, recs)
    (tmp_path / "cells.csv").write_text("C0-1\nC1\n")
    r = programs2.export_metrics(p, tmp_path / "cells.csv",
                                 tmp_path / "om.tsv", tmp_path / "oc.tsv")
    assert r == {"cells": 2, "umis": 3, "reads": 4}
    om = (tmp_path / "om.tsv").read_text().splitlines()
    assert om[0] == "cell\tumi\tgene\tnb_read"
    assert sorted(om[1:]) == ["C0\tU0\tG2\t2", "C0\tU1\tnogene\t1",
                              "C1\tU2\tG1\t1"]
    oc = (tmp_path / "oc.tsv").read_text().splitlines()
    assert oc[0] == "cell\tnb_read\tnb_umi"
    assert sorted(oc[1:]) == ["C0\t3\t2", "C1\t1\t1"]


def test_junction_annotate(tmp_path):
    # exons (101-200) (301-400): intron 201..300 -> donor GT @201, AG @299
    genome = ["N"] * 500
    genome[200:202] = "GT"   # intron first 2 bases, 1-based 201-202
    genome[298:300] = "AG"   # intron last 2 bases, 1-based 299-300
    (tmp_path / "g.fa").write_text(">chr1\n" + "".join(genome) + "\n")
    (tmp_path / "m.refFlat").write_text(
        "G\tT1\tchr1\t+\t100\t400\t100\t400\t2\t100,300,\t200,400,\n")
    r = programs2.junction_annotate(tmp_path / "m.refFlat",
                                    tmp_path / "g.fa", tmp_path / "j.tsv")
    assert r["junctions"] == 1 and r["canonical"] == 1
    assert "200-301\tGT\tAG\ttrue" in (tmp_path / "j.tsv").read_text()


def test_split_bam_per_stage(tmp_path):
    recs = [_rec("r0", tags=[("BC", "Z", "AAAA-sampleA")]),
            _rec("r1", tags=[("BC", "Z", "CCCC-sampleB")]),
            _rec("r2", tags=[("BC", "Z", "GGGG-sampleC")]),  # not in csv
            _rec("r3", tags=[("BC", "Z", "TTTT")])]          # no suffix
    p = _bam(tmp_path, recs)
    csv = tmp_path / "stages.csv"
    csv.write_text('sampleA,stage 1\n"sampleB",stage2\n\n')
    r = programs2.split_bam_per_stage(p, tmp_path / "out", csv)
    assert r == {"written": 2, "stages": 2}
    with BamReader(tmp_path / "out" / "in-stage_1.bam") as rd:
        assert [x.qname for x in rd] == ["r0"]
    with BamReader(tmp_path / "out" / "in-stage2.bam") as rd:
        assert [x.qname for x in rd] == ["r1"]


def test_crispr_stats(tmp_path):
    def rec(name, pos, cigar):
        return BamRecord(qname=name, flag=0, ref_id=0, pos=pos, mapq=60,
                         cigar=cigar, seq="A" * 30,
                         qual=bytes([30]) * 30, tags=[])
    recs = [
        # 1-based start 101; 10M 15D 10M -> deletion starts at ref 111
        rec("big", 100, [("M", 10), ("D", 15), ("M", 10)]),
        rec("small", 100, [("M", 10), ("D", 3), ("M", 10)]),
        rec("nodel", 100, [("M", 30)]),
        rec("outside", 5000, [("M", 10), ("D", 50), ("M", 10)]),
    ]
    p = _bam(tmp_path, recs)
    r = programs2.crispr_stats(p, tmp_path / "h.tsv", tmp_path / "d.tsv",
                               min_size=10, coord="chr1:50-400")
    assert r == {"records": 3, "max_deletion": 15}
    assert (tmp_path / "d.tsv").read_text() == "big\t111\t15\n"
    lines = (tmp_path / "h.tsv").read_text().splitlines()
    assert lines[0] == "length\tnumber"
    assert lines[15] == "14\t0" and lines[16] == "15\t1"
    assert len(lines) == 17


def test_parse_fastq_cdna(tmp_path):
    d = tmp_path / "fq"
    d.mkdir()
    seq = "ACGT" * 30  # 120 nt
    (d / "a.fastq").write_text(
        f"@r1_AEnd=10_PAst=100_FWD\n{seq}\n+\n{'I'*120}\n"
        f"@r2_noinfo\n{seq}\n+\n{'I'*120}\n")
    r = programs2.parse_fastq_cdna(d, tmp_path / "out", offset=28,
                                   min_cdna=20)
    assert r == {"files": 1, "reads": 2, "sliced": 1}
    out = (tmp_path / "out" / "a.fastq").read_text().splitlines()
    # cDNA = seq[10+28 : 99] (0-based, end-exclusive) per ParseFastq.java:76
    assert out[0] == "@r1_AEnd=10_PAst=100_FWD"
    assert out[1] == seq[38:99]
    assert out[2] == "+" and out[3] == ""           # empty QV line
    assert out[5] == seq                            # r2: whole read kept


def test_parse_tr_stats(tmp_path):
    csv = tmp_path / "bc.csv"
    csv.write_text("1,CATTCCTA,pbs_1239,A1,T\n2,CTTCATCA,pbs_1205,A2,R\n")
    def rec(name, bc1, cell, umi, gene, xf):
        return _rec(name, tags=[("CR", "Z", f"{bc1}_BB_CC"),
                                ("CB", "Z", cell), ("pN", "Z", umi),
                                ("GN", "Z", gene), ("XF", "Z", xf),
                                ("pS", "Z", "s1")])
    recs = [rec("r0", "CATTCCTA", "cell1", "U1", "G1", "CODING"),
            rec("r1", "CATTCCTA", "cell1", "U1", "G1", "CODING"),  # dup UMI
            rec("r2", "CTTCATCA", "cell1", "U2", "G1", "CODING"),
            rec("r3", "CATTCCTA", "cell2", "U3", "G2", "INTRONIC"),
            rec("r4", "GGGGGGGG", "cell2", "U4", "G2", "UTR")]     # unknown
    p = _bam(tmp_path, recs)
    r = programs2.parse_tr_stats(p, csv, tmp_path / "out")
    assert r["used"] == 4 and r["genes"] == 2 and r["cells"] == 2
    gene = (tmp_path / "out" / "gene_stats.txt").read_text().splitlines()
    assert gene[0].split("\t") == [
        "gene", "CODING_T", "CODING_R", "UTR_T", "UTR_R", "INTRONIC_T",
        "INTRONIC_R", "INTERGENIC_T", "INTERGENIC_R"]
    row = {l.split("\t")[0]: l.split("\t")[1:] for l in gene[1:]}
    assert row["G1"] == ["1", "1", "0", "0", "0", "0", "0", "0"]
    assert row["G2"] == ["0", "0", "0", "0", "1", "0", "0", "0"]
    cell = (tmp_path / "out" / "cell_stats.txt").read_text().splitlines()
    crow = {l.split("\t")[0]: l.split("\t")[1:] for l in cell[1:]}
    assert crow["cell1"] == ["s1", "1", "1", "0", "0", "0", "0", "0", "0"]
