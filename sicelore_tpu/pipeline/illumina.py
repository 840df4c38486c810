"""Illumina-guided mode (legacy v1 workflow, minimal support).

Reference: `parseillumina` subcommand + BamSerializer + Illumina
BC/UMI analyzers (jar com/rw/illuminabamparser/*, programs/
BamSerializer.java; config.xml:190-243 "USED ONLY FOR ILLUMINA GUIDED").
Mostly unused in the 2.1 short-read-free workflow; provided here as:

  * parse_illumina_bam: serialize an Illumina 10x BAM (CB/UB cell/UMI tags,
    GX/GN gene tags) into a {gene: {cell: [umis]}} table (json.gz)
  * GuidedUmiTable: ED-snap a Nanopore UMI candidate to the nearest
    Illumina UMI of the same (gene, cell)
"""
from __future__ import annotations

import gzip
import json
from collections import defaultdict
from pathlib import Path

from sicelore_tpu.core.umicluster import myers_ed
from sicelore_tpu.io.bam import BamReader


def parse_illumina_bam(in_bam, out_json_gz, cell_tag="CB", umi_tag="UB",
                       gene_tags=("GN", "GX")):
    """Illumina 10x BAM -> gene -> cell -> sorted unique UMI list."""
    table: dict[str, dict[str, set]] = defaultdict(lambda: defaultdict(set))
    n = 0
    with BamReader(in_bam) as rd:
        for r in rd:
            bc = r.get_tag(cell_tag)
            umi = r.get_tag(umi_tag)
            gene = None
            for g in gene_tags:
                gene = r.get_tag(g)
                if gene:
                    break
            if bc and umi and gene:
                table[gene][bc.replace("-1", "")].add(umi)
                n += 1
    out = {g: {c: sorted(us) for c, us in cells.items()}
           for g, cells in table.items()}
    with gzip.open(out_json_gz, "wt") as fh:
        json.dump(out, fh)
    return {"records_used": n, "genes": len(out)}


class GuidedUmiTable:
    def __init__(self, path: str | Path):
        with gzip.open(path, "rt") as fh:
            self.table = json.load(fh)

    def snap(self, gene: str | None, cell: str, umi: bytes,
             max_ed: int = 2,
             reduced_by: int = 2) -> tuple[bytes, int, bool] | None:
        """Nearest Illumina UMI of (gene, cell) within max_ed, or None.

        Returns (illumina_umi, ed, reduced). If no candidate matches at
        full length, retries with the UMI truncated by `reduced_by` bases
        against equally-truncated candidates (the reference's
        "UMI_match_with_reduced_length" scan, flagged with the UR tag —
        Jar/config.xml:487-490); the returned UMI is still full-length.
        """
        if not gene:
            return None
        cands = self.table.get(gene, {}).get(cell)
        if not cands:
            return None
        best, best_ed = None, max_ed + 1
        for c in cands:
            ed = myers_ed(umi, c.encode())
            if ed < best_ed:
                best, best_ed = c, ed
        if best is not None:
            return best.encode(), best_ed, False
        if reduced_by > 0 and len(umi) > reduced_by:
            short = umi[:-reduced_by]
            for c in cands:
                ed = myers_ed(short, c.encode()[:len(short)])
                if ed < best_ed:
                    best, best_ed = c, ed
            if best is not None:
                return best.encode(), best_ed, True
        return None
