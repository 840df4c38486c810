"""Illumina-guided mode tests."""
from sicelore_tpu.io.bam import BamHeader, BamRecord, BamWriter
from sicelore_tpu.pipeline.illumina import GuidedUmiTable, parse_illumina_bam

HDR = BamHeader("@SQ\tSN:chr1\tLN:100000\n", [("chr1", 100000)])


def test_parse_and_snap(tmp_path):
    p = tmp_path / "ill.bam"
    with BamWriter(p, HDR) as w:
        for i, (cb, ub, gn) in enumerate([
                ("CELL1-1", "AAACCCGGG", "GENEA"),
                ("CELL1-1", "AAACCCGGG", "GENEA"),   # dup collapses
                ("CELL1-1", "TTTTTTTTT", "GENEA"),
                ("CELL2-1", "CCCCCCCCC", "GENEB")]):
            w.write(BamRecord(qname=f"i{i}", flag=0, ref_id=0, pos=100,
                              mapq=60, cigar=[("M", 4)], seq="ACGT",
                              qual=b"\x28" * 4,
                              tags=[("CB", "Z", cb), ("UB", "Z", ub),
                                    ("GN", "Z", gn)]))
    r = parse_illumina_bam(p, tmp_path / "t.json.gz")
    assert r == {"records_used": 4, "genes": 2, "region_entries": 3}
    t = GuidedUmiTable(tmp_path / "t.json.gz")
    # 1-error candidate snaps to the Illumina UMI
    assert t.snap("GENEA", "CELL1", b"AAACCCGGT") == (b"AAACCCGGG", 1, False)
    # too far / unknown gene-cell -> None
    assert t.snap("GENEA", "CELL1", b"GGGGGGAAA") is None
    assert t.snap("GENEB", "CELL1", b"AAACCCGGG") is None
    assert t.snap(None, "CELL1", b"AAACCCGGG") is None
    # reduced-length fallback: last 2 bases garbled beyond full-length ED,
    # but the 7-mer prefix matches exactly -> reduced=True (UR tag)
    assert t.snap("GENEA", "CELL1", b"AAACCCGTT", max_ed=1) == \
        (b"AAACCCGGG", 0, True)
    assert t.snap("GENEA", "CELL1", b"AAACCCGTT", max_ed=1,
                  reduced_by=0) is None


def test_guided_bc_tiers(tmp_path):
    """Tiered guided cell-BC search at BamSerializer depth: gene tier,
    genomic-region tier (config.xml:199-208), all-BCs tier, ambiguity
    bailout (config.xml:209-216)."""
    p = tmp_path / "ill.bam"
    rows = [
        ("AAAAAAAACCCCCCCC-1", "AAACCCGGG", "GENEA", 500, 0),
        ("GGGGGGGGTTTTTTTT-1", "CCCCCCCCC", "GENEB", 5000, 0),
        ("AAAAAAAATTTTTTTT-1", "TTTTTTTTT", None, 9000, 16),
    ]
    with BamWriter(p, HDR) as w:
        for i, (cb, ub, gn, pos, flag) in enumerate(rows):
            tags = [("CB", "Z", cb), ("UB", "Z", ub)]
            if gn:
                tags.append(("GN", "Z", gn))
            w.write(BamRecord(qname=f"i{i}", flag=flag, ref_id=0, pos=pos,
                              mapq=60, cigar=[("M", 50)], seq="A" * 50,
                              qual=b"\x28" * 50, tags=tags))
    parse_illumina_bam(p, tmp_path / "t.json.gz")
    t = GuidedUmiTable(tmp_path / "t.json.gz")
    # gene tier: 1-sub neighbor of GENEA's only cell
    got = t.guided_bc(b"AAAAAAAACCCCCCCT", gene="GENEA")
    assert got == (b"AAAAAAAACCCCCCCC", 1, "gene")
    # region tier: gene unknown, but the read's 3' end sits near the
    # tagless Illumina read at chr1:9050
    got = t.guided_bc(b"AAAAAAAATTTTTTTA", contig="chr1", pos3=9100)
    assert got == (b"AAAAAAAATTTTTTTT", 1, "region")
    # all-BCs tier at ed<=3
    got = t.guided_bc(b"GGGGGGGGTTTTTAAA")
    assert got == (b"GGGGGGGGTTTTTTTT", 3, "all")
    # far from everything -> None
    assert t.guided_bc(b"CCCCGGGGAAAATTTT") is None
