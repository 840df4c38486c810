"""Gene-name tagging from a refFlat model (GE tag).

Plays the role of the reference's gene taggers: the jar's DefaultTagger /
Drop-seq TagReadWithGeneExonFunction (config.xml:88-90; README.md:661) and
the Sicelore AddGeneNameTag program (programs/AddGeneNameTag.java — Drop-seq
port with LocusFunction scoring CODING > UTR > INTRONIC > INTERGENIC and
strand filtering).

Implementation: per-chromosome sorted interval arrays over transcript exons
and gene spans; a record's alignment blocks vote for overlapping genes —
exonic overlap outranks intronic overlap, strand must match (with
multi-gene tolerance as in AddGeneNameTag.java:162-194).
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from sicelore_tpu.core.refflat import RefFlatModel


class GeneTagger:
    def __init__(self, model: RefFlatModel):
        # chrom -> list of (gene, strand, span_start, span_end, exon_array)
        self.by_chrom: dict[str, list] = defaultdict(list)
        genes_seen = {}
        for gene, trs in model.by_gene.items():
            by_c = defaultdict(list)
            for tr in trs:
                by_c[(tr.chrom, tr.strand)].append(tr)
            for (chrom, strand), sub in by_c.items():
                span_s = min(t.tx_start for t in sub)
                span_e = max(t.tx_end for t in sub)
                exons = sorted({(s, e) for t in sub for (s, e) in t.exons})
                self.by_chrom[chrom].append(
                    (gene, strand, span_s, span_e,
                     np.array(exons, dtype=np.int64).reshape(-1, 2)))
        # sort by span start + parallel arrays for bisect
        self.spans: dict[str, tuple] = {}
        for chrom, lst in self.by_chrom.items():
            lst.sort(key=lambda x: x[2])
            self.spans[chrom] = (
                np.array([x[2] for x in lst], dtype=np.int64),
                np.array([x[3] for x in lst], dtype=np.int64))

    def genes_for(self, chrom: str, blocks: list[tuple[int, int]],
                  strand: str | None = None) -> list[str]:
        """Genes whose exons overlap the given 1-based blocks, best first.

        Exonic overlap (bases) scores 1000x intronic overlap; strand
        mismatch filtered unless it would remove every candidate (multi-gene
        tolerance, AddGeneNameTag.java:162-194)."""
        lst = self.by_chrom.get(chrom)
        if not lst or not blocks:
            return []
        starts, ends = self.spans[chrom]
        lo = min(s for s, _ in blocks)
        hi = max(e for _, e in blocks)
        # candidate genes: span overlaps [lo, hi]
        i0 = int(np.searchsorted(ends, lo, side="left"))
        scores: dict[str, tuple[int, int]] = {}
        for idx in range(len(lst)):
            gene, gstrand, ss, se, exons = lst[idx]
            if ss > hi:
                break
            if se < lo:
                continue
            exonic = intronic = 0
            for (bs, be) in blocks:
                if be < ss or bs > se:
                    continue
                ov = np.minimum(exons[:, 1], be) - np.maximum(exons[:, 0], bs) + 1
                exonic += int(np.maximum(ov, 0).sum())
                intronic += max(0, min(be, se) - max(bs, ss) + 1)
            if exonic + intronic > 0:
                same = (strand is None or strand == gstrand)
                scores[gene] = (exonic * 1000 + intronic, same)
        if not scores:
            return []
        stranded = {g: s for g, (s, same) in scores.items() if same}
        pool = stranded if stranded else {g: s for g, (s, _) in scores.items()}
        return [g for g, _ in sorted(pool.items(), key=lambda kv: -kv[1])]

    def tag(self, chrom: str, blocks, strand: str | None = None) -> str | None:
        g = self.genes_for(chrom, blocks, strand)
        return g[0] if g else None
