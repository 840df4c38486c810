"""AnnotateModel, JunctionValidator, SNPMatrix3pend, AddIsoBam.

AnnotateModel (programs/AnnotateModel.java:56-188): re-validate a
CollapseModel txt against CAGE/polyA BEDs + a short-read BAM, appending
validation columns. Operates on this repo's CollapseModel txt format
(column 12 = novelJunctions).

JunctionValidator (programs/JunctionValidator.java): classify a junction
table against a refFlat model (known junction / known splice sites /
novel) with short-read support counts.

SNPMatrix3pend (programs/SNPMatrix3pend.java): spliced distance of SNV
positions to the molecule's isoform 3' end (TranscriptRecord.getDistanceTo3p,
TranscriptRecord.java:413-444).

AddIsoBam (programs/AddIsoBam.java / Isobam.java): merge IG/IT molecule
tags from an isobam into another BAM by (BC, U8).
"""
from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

from sicelore_tpu.core.collapse import CollapsedModel, _is_in
from sicelore_tpu.core.refflat import RefFlatModel, TranscriptRecord
from sicelore_tpu.io.bam import BamReader, BamWriter
from sicelore_tpu.io.bed import BedModel


def annotate_model(txt_path, short_bam, cage_bed, polya_bed, out_path,
                   delta: int = 0, cage_cutoff: int = 50,
                   polya_cutoff: int = 50, junc_cutoff: int = 1):
    cage = BedModel.load(cage_bed) if cage_bed else None
    polya = BedModel.load(polya_bed) if polya_bed else None
    juncs = (CollapsedModel._short_read_junctions(short_bam)
             if short_bam else {})
    n = 0
    with open(txt_path) as fh, open(out_path, "w") as os_:
        header = fh.readline().rstrip("\n")
        os_.write(header + "\tis_validated\tsupport_reads\tdist_cagepeak"
                  "\tdist_polya\n")
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            tok = line.split("\t")
            chrom, strand = tok[2], tok[3]
            start, end = int(tok[4]), int(tok[5])
            njuncs = tok[11] if len(tok) > 11 else "-"
            five = start if strand == "+" else end
            three = end if strand == "+" else start
            dist_cage = cage.distance(chrom, strand, five) if cage else 0
            dist_polya = polya.distance(chrom, strand, three) if polya else 0
            ok = (abs(dist_cage) <= cage_cutoff
                  and abs(dist_polya) <= polya_cutoff)
            support = 0
            if njuncs not in ("-", ""):
                for j in njuncs.split(","):
                    j = j.split("=")[-1].split(":")[-1]
                    a, b = j.split("-")
                    s = juncs.get((chrom, int(a), int(b)), 0)
                    support += s
                    if s < junc_cutoff:
                        ok = False
            os_.write(f"{line}\t{str(ok).lower()}\t{support}\t{dist_cage}"
                      f"\t{dist_polya}\n")
            n += 1
    return {"isoforms": n}


def junction_validator(junctions_tsv, refflat, out_tsv, short_bam=None,
                       delta: int = 2, chrom_col=1, start_col=4, end_col=5):
    """Classify junctions (e.g. SQANTI2 junctions.txt) vs a refFlat model."""
    model = RefFlatModel.load(refflat)
    by_chrom_juncs = defaultdict(list)
    by_chrom_sites = defaultdict(set)
    for trs in model.by_gene.values():
        for t in trs:
            for (a, b) in t.junctions.tolist():
                by_chrom_juncs[t.chrom].append((a, b))
                by_chrom_sites[t.chrom].update((a, b))
    support = (CollapsedModel._short_read_junctions(short_bam)
               if short_bam else {})
    counts = defaultdict(int)
    n = 0
    with open(junctions_tsv) as fh, open(out_tsv, "w") as os_:
        header = fh.readline().rstrip("\n")
        os_.write(header + "\tclassification\tshort_read_support\n")
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            tok = line.split("\t")
            chrom = tok[chrom_col]
            a, b = int(tok[start_col]), int(tok[end_col])
            if _is_in((a, b), by_chrom_juncs.get(chrom, []), delta):
                cls = "known_junction"
            elif (a in by_chrom_sites.get(chrom, set())
                  and b in by_chrom_sites.get(chrom, set())):
                cls = "known_splicesites"
            else:
                cls = "novel"
            counts[cls] += 1
            n += 1
            os_.write(f"{line}\t{cls}\t{support.get((chrom, a, b), 0)}\n")
    return {"junctions": n, **counts}


def snp_matrix_3pend(in_bam, snp_csv, refflat, out_tsv, it_tag="IT",
                     tags=None):
    """Distance of each SNV hit to its molecule's isoform 3' end."""
    from sicelore_tpu.core.longread import TagConfig
    from sicelore_tpu.pipeline.snp_fusion import (parse_snp_descriptors,
                                                  read_pos_at_ref)
    tags = tags or TagConfig()
    model = RefFlatModel.load(refflat)
    snps = parse_snp_descriptors(snp_csv)
    by_chrom = defaultdict(list)
    for s in snps:
        by_chrom[s["chrom"]].append(s)
    n = 0
    with BamReader(in_bam) as rd, open(out_tsv, "w") as os_:
        os_.write("read\tcellBC\tUMI\tgene\tposition\tbase\tisoform"
                  "\tdist_to_3p\n")
        ref_names = [x for x, _ in rd.header.refs]
        for r in rd:
            if r.is_unmapped or r.ref_id < 0:
                continue
            chrom = ref_names[r.ref_id]
            for s in by_chrom.get(chrom, []):
                pos = s["positions"][0]
                if not (r.pos + 1 <= pos <= r.reference_end()):
                    continue
                rp = read_pos_at_ref(r.cigar, r.pos + 1, pos)
                if rp <= 0 or rp > len(r.seq):
                    continue
                it = r.get_tag(it_tag)
                gene = s["gene"]
                tr = model.select_one(gene, it) if it else None
                dist = _distance_to_3p(tr, pos) if tr else -1
                os_.write(f"{r.qname}\t{r.get_tag(tags.cell)}\t"
                          f"{r.get_tag(tags.umi)}\t{gene}\t{pos}\t"
                          f"{r.seq[rp - 1]}\t{it or 'undef'}\t{dist}\n")
                n += 1
    return {"hits": n}


def _distance_to_3p(t: TranscriptRecord, pos: int) -> int:
    """Spliced distance from genomic pos to the transcript 3' end
    (TranscriptRecord.getDistanceTo3p, TranscriptRecord.java:413-444)."""
    dist = 0
    if t.strand == "-":
        for (s, e) in t.exons:
            if s < pos:
                dist += (pos - s) if e > pos else (e - s)
    else:
        for (s, e) in t.exons:
            if e > pos:
                dist += (e - pos) if s < pos else (e - s)
    return dist


def add_isobam(in_bam, isobam, out_bam, cell_tag="BC", umi_tag="U8"):
    """Merge IG/IT tags from an isobam into another BAM by (BC, U8)."""
    mapping = {}
    with BamReader(isobam) as rd:
        for r in rd:
            bc, u8 = r.get_tag(cell_tag), r.get_tag(umi_tag)
            ig, it = r.get_tag("IG"), r.get_tag("IT")
            if bc and u8 and ig:
                mapping[(bc, u8)] = (ig, it or "undef")
    n = tagged = 0
    with BamReader(in_bam) as rd, BamWriter(out_bam, rd.header) as w:
        for r in rd:
            n += 1
            key = (r.get_tag(cell_tag), r.get_tag(umi_tag))
            m = mapping.get(key)
            if m:
                r.set_tag("IG", m[0], "Z")
                r.set_tag("IT", m[1], "Z")
                tagged += 1
            w.write(r)
    return {"records": n, "tagged": tagged}
