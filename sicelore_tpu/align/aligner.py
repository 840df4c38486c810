"""Spliced read -> BAM alignment driver (the `minimap2 -ax splice -uf`
role in the reference workflow, main.nf:64,200).

Two-phase batches: phase 1 chains every read and plans its CIGAR,
collecting ordinary gap segments into the device GapBatcher; phase 2 runs
ONE banded-alignment sweep per length bucket and assembles records.
Output is a coordinate-sorted BAM + BAI through the framework's own codec
(io/bam.py) with the tags downstream stages read (de, NM, AS, tp).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from sicelore_tpu.align import chain as chainmod
from sicelore_tpu.align import extend as ext
from sicelore_tpu.align import index as idx
from sicelore_tpu.io.bam import BamRecord, BamWriter
from sicelore_tpu.utils import dna


class NativeAligner:
    def __init__(self, reference, k: int = idx.K, w: int = idx.W,
                 use_device: bool | None = None, junc_bed=None):
        if isinstance(reference, (str, Path)):
            contigs = idx.load_fasta(reference)
        else:
            contigs = reference
        self.index = idx.MinimizerIndex(contigs, k, w)
        self.k = k
        # annotated introns per contig (minimap2 --junc-bed role): BED
        # rows chrom/start/end[/...]; junctions within SNAP of a detected
        # one take priority over GT-AG motif snapping
        self.junctions: dict[str, tuple] = {}
        if junc_bed:
            per: dict[str, list] = {}
            import gzip
            op = gzip.open if str(junc_bed).endswith(".gz") else open
            with op(str(junc_bed), "rt") as fh:
                for line in fh:
                    f = line.rstrip("\n").split("\t")
                    if len(f) < 3 or f[0].startswith(("#", "track")):
                        continue
                    per.setdefault(f[0], []).append(
                        (int(f[1]), int(f[2])))
            for c, lst in per.items():
                lst.sort()
                self.junctions[c] = (
                    np.array([a for a, _ in lst], np.int64),
                    np.array([b for _, b in lst], np.int64))
        if use_device is None:
            try:
                import jax
                use_device = jax.devices()[0].platform == "tpu"
            except Exception:
                use_device = False
        self.use_device = use_device

    # ---- per-read planning ------------------------------------------------

    def _plan(self, seq: bytes, batcher: ext.GapBatcher):
        """-> None (unmapped) or a plan dict consumed by _finish."""
        chains = chainmod.best_chains(seq, self.index)
        if not chains:
            return None
        score, second, strand, q, g = chains[0]
        query = dna.revcomp_bytes(seq) if strand else seq
        # non-overlapping match blocks on one diagonal walk
        blocks = []          # (qs, qe, gs, ge) exact-ish anchor cover
        qe = ge = -1
        for qi, gi in zip(q.tolist(), g.tolist()):
            if qe < 0:
                blocks.append([qi, qi + self.k, gi, gi + self.k])
            elif qi >= qe and gi >= ge:
                blocks.append([qi, qi + self.k, gi, gi + self.k])
            elif qi - blocks[-1][0] == gi - blocks[-1][2] and qi + self.k > qe:
                blocks[-1][1] = qi + self.k
                blocks[-1][3] = gi + self.k
            else:
                continue
            qe, ge = blocks[-1][1], blocks[-1][3]
        ci, _ = self.index.contig_of(int(blocks[0][2]))
        coff = int(self.index.offsets[ci])
        cseq = self.index.seqs[self.index.names[ci]]
        # exact end extension (the rest of the overhang soft-clips)
        qs, gs = blocks[0][0], blocks[0][2] - coff
        while qs > 0 and gs > 0 and query[qs - 1] == cseq[gs - 1]:
            qs -= 1
            gs -= 1
        blocks[0][0], blocks[0][2] = qs, gs + coff
        qe2, ge3 = blocks[-1][1], blocks[-1][3] - coff
        while qe2 < len(query) and ge3 < len(cseq) \
                and query[qe2] == cseq[ge3]:
            qe2 += 1
            ge3 += 1
        blocks[-1][1], blocks[-1][3] = qe2, ge3 + coff
        segs = []            # ("M", n) | ("gap", handle|None, R, Q) |
        #                      ("intron", n, jlocal, Q) per inter-block gap
        # leading overhang: banded-extend to the read start when the ref
        # has room (minimap2's end extension); else soft-clip
        q0 = blocks[0][0]
        gs0 = blocks[0][2] - coff
        if 0 < q0 <= ext.MAX_SEG and gs0 - q0 >= 0:
            R = cseq[gs0 - q0:gs0]
            Q = query[:q0]
            segs.append(("lead", batcher.add(R, Q)
                         if batcher.feasible(R, Q) else None, R, Q))
        else:
            segs.append(("S", q0))
        segs.append(("M", blocks[0][1] - blocks[0][0]))
        for b0, b1 in zip(blocks, blocks[1:]):
            Q = query[b0[1]:b1[0]]
            gs, ge2 = b0[3] - coff, b1[2] - coff
            R = cseq[gs:ge2]
            if len(R) - len(Q) >= ext.MIN_INTRON:
                segs.append(("intron", len(R) - len(Q), gs, Q))
            elif len(R) == 0 and len(Q) == 0:
                pass
            elif batcher.feasible(R, Q) and len(R) and len(Q):
                segs.append(("gap", batcher.add(R, Q), R, Q))
            else:
                segs.append(("gap", None, R, Q))
            segs.append(("M", b1[1] - b1[0]))
        qt = len(query) - blocks[-1][1]
        ge4 = blocks[-1][3] - coff
        if 0 < qt <= ext.MAX_SEG and ge4 + qt <= len(cseq):
            R = cseq[ge4:ge4 + qt]
            Q = query[blocks[-1][1]:]
            segs.append(("tail", batcher.add(R, Q)
                         if batcher.feasible(R, Q) else None, R, Q))
        else:
            segs.append(("S", qt))
        return {"strand": strand, "query": query, "score": score,
                "second": second, "ci": ci, "pos": int(blocks[0][2]) - coff,
                "cseq": cseq, "segs": segs}

    def _finish(self, name: bytes, seq: bytes, qual: bytes, plan,
                batcher: ext.GapBatcher) -> BamRecord:
        if plan is None:
            return BamRecord(qname=name.decode(), flag=4, seq=seq.decode(),
                             qual=bytes(q - 33 for q in qual))
        cseq = plan["cseq"]
        query = plan["query"]
        ops: list = []
        pos_shift = 0
        for seg in plan["segs"]:
            kind = seg[0]
            if kind in ("S", "M"):
                ext._merge(ops, kind, seg[1])
            elif kind in ("lead", "tail"):
                _, handle, R, Q = seg
                sub = (batcher.get(handle, R, Q) if handle is not None
                       else ext.plain_gap_ops(len(R), len(Q)))
                if kind == "lead":
                    # normalize: a leading D shifts pos right instead; a
                    # leading I becomes part of the soft clip; the aligned
                    # ref consumed shifts pos left
                    while sub and sub[0][0] in ("D", "I"):
                        op, n = sub.pop(0)
                        if op == "I":
                            ext._merge(ops, "S", n)
                    pos_shift -= sum(n for op, n in sub
                                     if op in ("M", "D"))
                else:
                    while sub and sub[-1][0] in ("D", "I"):
                        op, n = sub.pop()
                        if op == "I":
                            sub.append(["S", n])
                            break
                for op, n in sub:
                    ext._merge(ops, op, n)
            elif kind == "intron":
                _, intron, jlocal, Q = seg
                ann = self._annotated_junction(
                    plan["ci"], jlocal, len(Q), intron, len(Q) + intron)
                if ann is not None:
                    as_, ae_ = ann
                    left = as_ - jlocal
                    ext._merge(ops, "M", left)
                    ext._merge(ops, "N", ae_ - as_)
                    rest_q = len(Q) - left
                    rest_r = (len(Q) + intron) - (ae_ - as_) - left
                    if rest_q == rest_r:
                        ext._merge(ops, "M", rest_q)
                    else:
                        for op, n in ext.plain_gap_ops(rest_r, rest_q):
                            ext._merge(ops, op, n)
                    continue
                jsnap = ext.snap_junction(cseq, jlocal + len(Q), intron)
                left = int(np.clip(jsnap - jlocal, 0, len(Q)))
                ext._merge(ops, "M", left)
                ext._merge(ops, "N", intron)
                rest_q = len(Q) - left
                ext._merge(ops, "M", rest_q)
            else:
                _, handle, R, Q = seg
                sub = (batcher.get(handle, R, Q) if handle is not None
                       else ext.plain_gap_ops(len(R), len(Q)))
                for op, n in sub:
                    ext._merge(ops, op, n)
        # trailing/leading empty clips drop; compute NM/de over M runs
        ops = [(op, n) for op, n in ops if n > 0]
        qpos = 0
        gpos = plan["pos"] = plan["pos"] + pos_shift
        mm = gaps = matched = 0
        for op, n in ops:
            if op in ("S", "I"):
                if op == "I":
                    gaps += n
                qpos += n
            elif op in ("D", "N"):
                if op == "D":
                    gaps += n
                gpos += n
            elif op == "M":
                a = np.frombuffer(query[qpos:qpos + n], np.uint8)
                b = np.frombuffer(cseq[gpos:gpos + n], np.uint8)
                mm += int((a != b[:len(a)]).sum())
                matched += n
                qpos += n
                gpos += n
        nm = mm + gaps
        de = round(nm / max(matched + gaps, 1), 4)
        flag = 16 if plan["strand"] else 0
        qv = qual[::-1] if plan["strand"] else qual
        return BamRecord(
            qname=name.decode(), flag=flag, ref_id=plan["ci"],
            pos=plan["pos"], mapq=chainmod.mapq(plan["score"],
                                                plan["second"]),
            cigar=[(op, n) for op, n in ops],
            seq=query.decode(),
            qual=bytes(q - 33 for q in qv),
            tags=[("NM", "i", nm), ("AS", "i", int(plan["score"])),
                  ("de", "f", de), ("tp", "A", "P")])

    def _annotated_junction(self, ci: int, jlocal: int, qlen: int,
                            intron: int, rlen: int):
        """Closest annotated intron compatible with the detected one:
        start within the query-gap span, length within +-16 of the
        estimate, consistent with the ref segment. -> (start, end) local
        coords or None."""
        ann = self.junctions.get(self.index.names[ci])
        if ann is None:
            return None
        starts, ends = ann
        lo = np.searchsorted(starts, jlocal)
        hi = np.searchsorted(starts, jlocal + qlen + 1)
        best = None
        for i in range(lo, hi):
            as_, ae_ = int(starts[i]), int(ends[i])
            ilen = ae_ - as_
            left = as_ - jlocal
            if abs(ilen - intron) > 16 or not (0 <= left <= qlen):
                continue
            if left + ilen > rlen:
                continue
            d = abs(as_ - (jlocal + qlen))
            if best is None or d < best[0]:
                best = (d, as_, ae_)
        return (best[1], best[2]) if best else None

    # ---- batch / file APIs ------------------------------------------------

    def align_batch(self, names, seqs, quals=None) -> list[BamRecord]:
        quals = quals or [b"I" * len(s) for s in seqs]
        batcher = ext.GapBatcher(self.use_device)
        plans = [self._plan(s, batcher) for s in seqs]
        if any(v for v in batcher.jobs.values()):
            batcher.run()
        return [self._finish(n, s, q, p, batcher)
                for n, s, q, p in zip(names, seqs, quals, plans)]

    def align_fastq_to_bam(self, fastq, out_bam, chunk_size: int = 2048,
                           keep_unmapped: bool = False):
        """fastq (file/dir) -> coordinate-sorted BAM + .bai. `--sam-hit-only`
        semantics by default (the reference drops unmapped reads)."""
        from sicelore_tpu.io import fastq as fqio
        from sicelore_tpu.io.bam import BamHeader, build_bai
        recs: list[BamRecord] = []
        n_in = 0
        fq = Path(fastq)
        files = fqio.find_fastq_files(fq) if fq.is_dir() else [fq]
        for f in files:
            for chunk in fqio.read_fastq(f, chunk_size):
                n_in += len(chunk)
                for r in self.align_batch(chunk.names, chunk.seqs,
                                          chunk.quals):
                    if keep_unmapped or not (r.flag & 4):
                        recs.append(r)
        recs.sort(key=lambda r: (r.ref_id if r.ref_id >= 0 else 1 << 30,
                                 r.pos))
        hdr = BamHeader(text="@HD\tVN:1.6\tSO:coordinate\n" + "".join(
            f"@SQ\tSN:{n}\tLN:{ln}\n"
            for n, ln in zip(self.index.names, self.index.lengths)),
            refs=[(n, int(ln)) for n, ln in zip(self.index.names,
                                                self.index.lengths)])
        w = BamWriter(out_bam, hdr)
        for r in recs:
            w.write(r)
        w.close()
        try:
            build_bai(out_bam)
        except Exception:
            pass
        return {"reads": n_in, "mapped": len(recs)}
