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
    assert r == {"records_used": 4, "genes": 2}
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
