"""AnnotateModel / JunctionValidator / SNPMatrix3pend / AddIsoBam tests."""
import numpy as np

from sicelore_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter
from sicelore_tpu.pipeline import annotate

HDR = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])

REFFLAT = ("GENEA\tTRA1\tchr1\t+\t100\t600\t100\t600\t3\t"
           "100,300,500,\t200,400,600,\n")


def _short_bam(tmp_path, n=4):
    p = tmp_path / "short.bam"
    with BamWriter(p, HDR) as w:
        for i in range(n):
            w.write(BamRecord(qname=f"s{i}", flag=0, ref_id=0, pos=180,
                              cigar=[("M", 20), ("N", 100), ("M", 20)],
                              seq="A" * 40, qual=b"\x28" * 40, mapq=60))
    return p  # supports junction (200, 301)


def test_annotate_model(tmp_path):
    txt = tmp_path / "cm.txt"
    txt.write_text(
        "geneId\ttranscriptId\tchrom\tstrand\ttxStart\ttxEnd\texons\tUMIs"
        "\tCells\tcategorie\tsubcategorie\tnovelJunctions\tx\tx\tx\tx\tx\tx\tx\n"
        "GENEA\tNovel.1\tchr1\t+\t100\t600\t2\t3\t2\tnovel_in_catalog"
        "\tcks\t200-301\t0\tfalse\t0\tfalse\t0\tfalse\tfalse\n")
    cage = tmp_path / "cage.bed"
    cage.write_text("chr1\t99\t110\tp\t0\t+\n")
    polya = tmp_path / "pa.bed"
    polya.write_text("chr1\t590\t600\tp\t0\t+\n")
    r = annotate.annotate_model(txt, _short_bam(tmp_path), cage, polya,
                                tmp_path / "out.txt")
    assert r == {"isoforms": 1}
    out = (tmp_path / "out.txt").read_text().strip().split("\n")
    assert out[0].endswith("is_validated\tsupport_reads\tdist_cagepeak"
                           "\tdist_polya")
    cols = out[1].split("\t")
    assert cols[-4] == "true" and cols[-3] == "4"


def test_junction_validator(tmp_path):
    (tmp_path / "m.refFlat").write_text(REFFLAT)
    juncs = tmp_path / "j.tsv"
    juncs.write_text("isoform\tchrom\tstrand\tnum\tstart\tend\n"
                     "i1\tchr1\t+\t1\t200\t301\n"      # known junction
                     "i2\tchr1\t+\t1\t200\t501\n"      # known splicesites
                     "i3\tchr1\t+\t1\t250\t350\n")     # novel
    r = annotate.junction_validator(juncs, tmp_path / "m.refFlat",
                                    tmp_path / "out.tsv",
                                    short_bam=_short_bam(tmp_path))
    assert r["known_junction"] == 1
    assert r["known_splicesites"] == 1
    assert r["novel"] == 1
    out = (tmp_path / "out.tsv").read_text()
    assert "i1\tchr1\t+\t1\t200\t301\tknown_junction\t4" in out


def test_snp3pend_and_addisobam(tmp_path):
    (tmp_path / "m.refFlat").write_text(REFFLAT)
    (tmp_path / "snp.csv").write_text("chr1,150,+,GENEA\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        w.write(BamRecord(qname="r1", flag=0, ref_id=0, pos=100, mapq=60,
                          cigar=[("M", 100)], seq="G" * 100,
                          qual=b"\x28" * 100,
                          tags=[("BC", "Z", "C1"), ("U8", "Z", "U1"),
                                ("IT", "Z", "TRA1")]))
    r = annotate.snp_matrix_3pend(p, tmp_path / "snp.csv",
                                  tmp_path / "m.refFlat",
                                  tmp_path / "3p.tsv")
    assert r == {"hits": 1}
    line = (tmp_path / "3p.tsv").read_text().strip().split("\n")[1]
    # spliced 3p distance from 150 (+), reference e-s arithmetic
    # (TranscriptRecord.java:413-444): (200-150) + (400-301) + (600-501)
    assert line.endswith("TRA1\t248")

    # AddIsoBam (AddIsoBam.java:78-106): per-record STRICT re-assignment.
    # Build a record whose junction structure exactly matches TRA1.
    iso_in = tmp_path / "iso_in.bam"
    with BamWriter(iso_in, HDR) as w:
        w.write(BamRecord(qname="y", flag=0, ref_id=0, pos=100, mapq=60,
                          cigar=[("M", 100), ("N", 100), ("M", 100),
                                 ("N", 100), ("M", 100)],
                          seq="A" * 300, qual=b"\x28" * 300,
                          tags=[("BC", "Z", "C1"), ("U8", "Z", "U1"),
                                ("GE", "Z", "GENEA")]))
        w.write(BamRecord(qname="z", flag=0, ref_id=0, pos=100, mapq=60,
                          cigar=[("M", 50)], seq="A" * 50, qual=b"\x28" * 50,
                          tags=[("BC", "Z", "C1"), ("U8", "Z", "U2"),
                                ("GE", "Z", "GENEA")]))
    r = annotate.add_isobam(iso_in, tmp_path / "m.refFlat",
                            tmp_path / "merged.bam")
    assert r == {"records": 2, "isoform_defined": 1}
    with BamReader(tmp_path / "merged.bam") as rd:
        its = [x.get_tag("IT") for x in rd]
    assert its == ["TRA1", "undef"]


def test_isobam_molinfos(tmp_path):
    """Isobam (Isobam.java:54-99): molinfos-driven record filter + tags."""
    mol = tmp_path / "x_molinfos.txt"
    mol.write_text(
        "cellBC\tUMI\tnbReads\tnbSupportingReads\tmappingPctId"
        "\tsnpPhredScore\tgeneId\ttranscriptId\n"
        "C1\tU1\t2\t1\t0.95\t\tGENEA\tTRA1\n"
        "C1\tU2\t1\t0\t0.90\t\tGENEA\tundef\n")
    p = tmp_path / "in.bam"
    with BamWriter(p, HDR) as w:
        for nm, u8 in (("a", "U1"), ("b", "U2"), ("c", "U3")):
            w.write(BamRecord(qname=nm, flag=0, ref_id=0, pos=100, mapq=60,
                              cigar=[("M", 10)], seq="A" * 10,
                              qual=b"\x28" * 10,
                              tags=[("BC", "Z", "C1"), ("U8", "Z", u8)]))
    r = annotate.isobam(p, mol, tmp_path / "o.bam")
    assert r == {"records": 3, "kept": 2}  # U3 not in molinfos -> dropped
    with BamReader(tmp_path / "o.bam") as rd:
        rows = [(x.qname, x.get_tag("IG"), x.get_tag("IT")) for x in rd]
    assert rows == [("a", "GENEA", "TRA1"), ("b", "GENEA", "undef")]
    # UNDEF=false drops undef molecules' records too (Isobam.java:73-79)
    r = annotate.isobam(p, mol, tmp_path / "o2.bam", undef=False)
    assert r["kept"] == 1
