"""Step 4b/5/6 helper-program tests."""
import numpy as np
import pytest

from sicelore_tpu.io import fastq
from sicelore_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from sicelore_tpu.pipeline import programs, snp_fusion

HDR = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])


def _rec(name, pos=1000, cigar=None, seq="ACGTACGTAC", tags=None, flag=0,
         mapq=60):
    cigar = cigar or [("M", len(seq))]
    return BamRecord(qname=name, flag=flag, ref_id=0, pos=pos, mapq=mapq,
                     cigar=cigar, seq=seq, qual=bytes([30]) * len(seq),
                     tags=tags or [])


def test_tagbamwithread_and_bam2fastq(tmp_path):
    with open(tmp_path / "reads.fastq", "wb") as fh:
        fh.write(b"@r1\nAAACCCGGGTTT\n+\nIIIIIIIIIIII\n@r2\nACGT\n+\nJJJJ\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        w.write(_rec("r1"))
        w.write(_rec("rX"))
    r = programs.tag_bam_with_read(p, tmp_path / "out.bam", tmp_path)
    assert r == {"records": 2, "tagged": 1}
    with BamReader(tmp_path / "out.bam") as rd:
        recs = {x.qname: x for x in rd}
    assert recs["r1"].get_tag("US") == "AAACCCGGGTTT"
    assert recs["r1"].get_tag("QS") == "IIIIIIIIIIII"
    assert recs["rX"].get_tag("US") is None
    # bam2fastq from tags
    r = programs.bam2fastq(tmp_path / "out.bam", tmp_path / "o.fastq",
                           seq_tag="US", qual_tag="QS")
    assert r == {"reads": 1}
    ch = list(fastq.read_fastq(tmp_path / "o.fastq"))[0]
    assert ch.seqs == [b"AAACCCGGGTTT"]


def test_deduplicate_molecule(tmp_path):
    recs = [(b"BC1-UMI1-3", b"AAAA"), (b"BC1-UMI1-5", b"CCCC"),
            (b"BC1-UMI1-5", b"GGGGG"), (b"BC2-UMI2-1", b"TTTT")]
    with open(tmp_path / "in.fastq", "wb") as fh:
        for n, s in recs:
            fh.write(b"@" + n + b"\n" + s + b"\n+\n" + b"I" * len(s) + b"\n")
    r = programs.deduplicate_molecule(tmp_path / "in.fastq",
                                      tmp_path / "out.fastq")
    assert r == {"reads": 4, "molecules": 2}
    ch = list(fastq.read_fastq(tmp_path / "out.fastq"))[0]
    got = dict(zip(ch.names, ch.seqs))
    # max RN wins; ties -> longest
    assert got[b"BC1-UMI1-5"] == b"GGGGG"
    assert got[b"BC2-UMI2-1"] == b"TTTT"


def test_add_bam_molecule_tags(tmp_path):
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        w.write(_rec("CELLAAA-UMIBBB-7"))
    programs.add_bam_molecule_tags(p, tmp_path / "o.bam")
    with BamReader(tmp_path / "o.bam") as rd:
        r = next(iter(rd))
    assert (r.get_tag("BC"), r.get_tag("U8"), r.get_tag("RN")) == (
        "CELLAAA", "UMIBBB", 7)


def test_add_gene_name_tag(tmp_path):
    refflat = tmp_path / "m.refFlat"
    refflat.write_text(
        "GA\tT1\tchr1\t+\t100\t500\t100\t500\t2\t100,400,\t200,500,\n"
        "GB\tT2\tchr1\t-\t1000\t1500\t1000\t1500\t1\t1000,\t1500,\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        w.write(_rec("r1", pos=120, seq="A" * 50))           # in GA exon, +
        w.write(_rec("r2", pos=1100, seq="A" * 50, flag=16))  # GB, - strand
        w.write(_rec("r3", pos=50000, seq="A" * 50))          # intergenic
    programs.add_gene_name_tag(p, tmp_path / "o.bam", refflat)
    with BamReader(tmp_path / "o.bam") as rd:
        tags = {r.qname: (r.get_tag("GE"), r.get_tag("GS"), r.get_tag("XF"))
                for r in rd}
    assert tags == {"r1": ("GA", "+", "CODING"),
                    "r2": ("GB", "-", "CODING"),
                    "r3": (None, None, "INTERGENIC")}


def test_add_gene_name_tag_locus_functions(tmp_path):
    """Drop-seq LocusFunction fidelity (AddGeneNameTag.java:116-161,
    343-369): UTR vs CODING via cds bounds, intronic-only genes excluded
    from GE but reflected in XF, antisense reads get no GE, overlapping
    same-strand genes comma-join."""
    refflat = tmp_path / "m.refFlat"
    refflat.write_text(
        # GA +: exons 101-200, 401-500 (1-based); CDS 150..450 ->
        # 101-149 and 451-500 are UTR
        "GA\tT1\tchr1\t+\t100\t500\t149\t450\t2\t100,400,\t200,500,\n"
        # GB +: overlaps GA's second exon region
        "GB\tT2\tchr1\t+\t380\t600\t380\t600\t1\t380,\t600,\n"
        # GC +: non-coding (cdsStart == cdsEnd) -> all-UTR exon
        "GC\tT3\tchr1\t+\t2000\t2500\t2000\t2000\t1\t2000,\t2500,\n"
        # GD +: read will fall entirely in the intron
        "GD\tT4\tchr1\t+\t5000\t9000\t5000\t9000\t2\t5000,8000,\t5100,9000,\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        w.write(_rec("utr5", pos=105, seq="A" * 30))    # GA 5' UTR
        w.write(_rec("cds", pos=160, seq="A" * 30))     # GA CODING
        w.write(_rec("multi", pos=420, seq="A" * 30))   # GA+GB overlap
        w.write(_rec("nc", pos=2100, seq="A" * 30))     # GC non-coding: UTR
        w.write(_rec("intron", pos=6000, seq="A" * 30))  # GD intron only
        w.write(_rec("anti", pos=160, seq="A" * 30, flag=16))  # antisense GA
    programs.add_gene_name_tag(p, tmp_path / "o.bam", refflat)
    with BamReader(tmp_path / "o.bam") as rd:
        tags = {r.qname: (r.get_tag("GE"), r.get_tag("GS"), r.get_tag("XF"))
                for r in rd}
    assert tags["utr5"] == ("GA", "+", "UTR")
    assert tags["cds"] == ("GA", "+", "CODING")
    assert tags["multi"] == ("GA,GB", "+,+", "CODING")
    assert tags["nc"] == ("GC", "+", "UTR")
    # intronic-only: no GE/GS (not CODING/UTR), XF reports INTRONIC
    assert tags["intron"] == (None, None, "INTRONIC")
    # antisense: strand filter removes GA -> no GE, XF still CODING
    assert tags["anti"] == (None, None, "CODING")


def test_export_clipped_and_readd_tags(tmp_path):
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        w.write(_rec("r1", cigar=[("S", 200), ("M", 100)], seq="A" * 300,
                     tags=[("US", "Z", "ACGT" * 80), ("QS", "Z", "I" * 320),
                           ("GE", "Z", "GENE1"), ("BC", "Z", "CELL1"),
                           ("U8", "Z", "UMI1")]))
        w.write(_rec("r2", seq="A" * 50))  # unclipped
    r = programs.export_clipped_reads(p, tmp_path / "clip.fastq")
    assert r == {"exported": 1}
    ch = list(fastq.read_fastq(tmp_path / "clip.fastq"))[0]
    assert ch.names == [b"r1_GENE1_CELL1_UMI1"]
    # re-map scenario: names become tags
    p2 = tmp_path / "re.bam"
    with BamWriter(p2, HDR) as w:
        w.write(_rec("r1_GENE1_CELL1_UMI1"))
    programs.add_bam_read_tags(p2, tmp_path / "re_t.bam")
    with BamReader(tmp_path / "re_t.bam") as rd:
        r = next(iter(rd))
    assert (r.get_tag("GE"), r.get_tag("BC"), r.get_tag("U8")) == (
        "GENE1", "CELL1", "UMI1")


def test_read_pos_at_ref():
    cigar = [("S", 5), ("M", 10), ("D", 3), ("M", 5), ("N", 100), ("M", 10)]
    # aln starts at ref 1000; read positions 6..15 map to 1000..1009
    assert snp_fusion.read_pos_at_ref(cigar, 1000, 1000) == 6
    assert snp_fusion.read_pos_at_ref(cigar, 1000, 1009) == 15
    assert snp_fusion.read_pos_at_ref(cigar, 1000, 1011) == 0  # in deletion
    assert snp_fusion.read_pos_at_ref(cigar, 1000, 1013) == 16
    assert snp_fusion.read_pos_at_ref(cigar, 1000, 1118) == 21  # after N


def test_snp_matrix(tmp_path):
    cells = tmp_path / "cells.csv"
    cells.write_text("CELL1-1\nCELL2-1\n")
    snps = tmp_path / "snps.csv"
    snps.write_text("chr1,1005,+,GENEX\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        # read covering 1001..1020, base at ref 1005 = seq[4]
        w.write(_rec("r1", pos=1000, seq="AAAAGAAAAAAAAAAAAAAA",
                     tags=[("BC", "Z", "CELL1"), ("U8", "Z", "U1"),
                           ("RN", "i", 3)]))
        w.write(_rec("r2", pos=1000, seq="AAAACAAAAAAAAAAAAAAA",
                     tags=[("BC", "Z", "CELL2"), ("U8", "Z", "U2"),
                           ("RN", "i", 2)]))
        # negative strand read: filtered (SNP strand +)
        w.write(_rec("r3", pos=1000, seq="AAAATAAAAAAAAAAAAAAA", flag=16,
                     tags=[("BC", "Z", "CELL1"), ("U8", "Z", "U3")]))
    st = snp_fusion.snp_matrix(p, snps, cells, tmp_path / "out")
    assert st["hits"] == 2
    mat = (tmp_path / "out" / "snp_snpmatrix.txt").read_text().strip()
    lines = mat.split("\n")
    rows = {l.split("\t")[1]: l.split("\t")[3:] for l in lines[1:]}
    assert rows["chr1:1005..G"] == ["1", "0"]
    assert rows["chr1:1005..C"] == ["0", "1"]


def test_fusion_detector(tmp_path):
    cells = tmp_path / "cells.csv"
    cells.write_text("CELL1-1\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        # molecule with two genes (fusion evidence across 2 records)
        for i, gene in enumerate(["GENEA", "GENEB"]):
            w.write(_rec("rf", pos=1000 + i * 5000, seq="A" * 40,
                         tags=[("BC", "Z", "CELL1"), ("U8", "Z", "UF"),
                               ("GE", "Z", gene)]))
        # normal single-gene molecule
        w.write(_rec("rn", pos=1000, seq="A" * 40,
                     tags=[("BC", "Z", "CELL1"), ("U8", "Z", "UN"),
                           ("GE", "Z", "GENEA")]))
    r = snp_fusion.fusion_detector(p, cells, tmp_path / "out")
    assert r["fusions"] == 1
    mat = (tmp_path / "out" / "fus_fusmatrix.txt").read_text()
    assert "GENEA|GENEB" in mat
