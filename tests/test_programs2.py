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
            _rec("r1", tags=[("BC", "Z", "X"), ("U8", "Z", "U"),
                             ("RN", "i", 3), ("IT", "Z", "TR1"),
                             ("US", "Z", "AAAA"), ("QS", "Z", "IIII")]),
            _rec("r2", tags=[("BC", "Z", "X"), ("RN", "i", 1),
                             ("IT", "Z", "undef")])]
    p = _bam(tmp_path, recs)
    assert programs2.filter_bam_mf(p, tmp_path / "a.bam")["kept"] == 2
    assert programs2.filter_molecule_bam(
        p, tmp_path / "b.bam", min_rn=2, require_isoform=True)["kept"] == 1
    assert programs2.export_umifound_records(
        p, tmp_path / "c.bam")["kept"] == 1
    assert programs2.clean_usuq(p, tmp_path / "d.bam")["tags_removed"] == 2
    programs2.add_label_to_barcode(p, tmp_path / "e.bam", "S1")
    with BamReader(tmp_path / "e.bam") as rd:
        tags = [r.get_tag("BC") for r in rd]
    assert tags == [None, "S1_X", "S1_X"]
    assert programs2.molecule_counter(p)["molecules"] == 1


def test_split_and_export(tmp_path):
    recs = [_rec(f"r{i}", tags=[("BC", "Z", f"C{i%2}"), ("U8", "Z", f"U{i}"),
                                ("US", "Z", "ACGT" * 5),
                                ("QS", "Z", "I" * 20)])
            for i in range(4)]
    p = _bam(tmp_path, recs)
    (tmp_path / "ids.txt").write_text("r1\nr3\n")
    assert programs2.split_bam(p, tmp_path / "s.bam",
                               tmp_path / "ids.txt")["kept"] == 2
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
