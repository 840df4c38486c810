"""Batched TPU consensus engine (the spoa replacement's device path).

The reference forks one `spoa` process per molecule (~167 UMIs/s on 20
cores, README.md:1146-1147). Here consensus is a fixed-shape batched
computation over [pairs, band] tensors:

  * per molecule: center = longest cDNA; every other read forms a
    (center, read) pair
  * banded Needleman-Wunsch (match +5 / mismatch -4 / gap -8 — spoa
    defaults) FORWARD and BACKWARD over a width-W diagonal band, scanning
    center positions; the within-column gap recurrence is a max-plus
    prefix scan (cummax of score - b*gap)
  * a cell is on an optimal path iff F + B == total — no sequential
    traceback; the entering band index per column classifies the move
    (diagonal -> base vote, read-gap -> deletion vote) and the on-path
    span gives insertion votes (up to K_INS per column)
  * votes segment-sum per molecule on device; the host assembles the
    majority consensus + agreement QVs with ConsensusMsa semantics
    (utils/ConsensusMsa.java:51-91), identical to the host engine
    ops/poa.py (validated against it in tests)

Shapes are bucketed (Lc to powers of two, band W static) so a handful of
executables serve any workload.
"""
from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from sicelore_tpu.ops import poa
from sicelore_tpu.utils import dna

MATCH, MISMATCH, GAP = poa.MATCH, poa.MISMATCH, poa.GAP
NEG = -(10**7)
K_INS = 4


@functools.partial(jax.jit, static_argnames=("W", "M"))
def consensus_votes(center: jax.Array, clens: jax.Array, reads: jax.Array,
                    rlens: jax.Array, mol_ids: jax.Array, W: int, M: int):
    """Votes for one bucket.

    center [P, Lc] int8 codes, clens [P] int32, reads [P, Lr] int8,
    rlens [P] int32, mol_ids [P] int32 (segment ids < M).
    Returns (col_votes [M, Lc, 5] int32 — channels A,C,G,T,gap —
    ins_votes [M, Lc+1, K_INS, 4] int32, pair_counts [M] int32).
    Insertion column j = insertions between center pos j-1 and j
    (j=0: before the first base).
    """
    P, Lc = center.shape
    Lr = reads.shape[1]
    W2 = W // 2
    bidx = jnp.arange(W, dtype=jnp.int32)[None, :]          # [1, W]
    g = jnp.int32(GAP)

    def sub_col(j):
        """Substitution scores for column j (1-based): center[j-1] vs
        read[i-1], i = j + b - W2. [P, W]."""
        i = j + bidx - W2                                    # [P->1, W]
        cb = center[:, j - 1][:, None]
        rb = jnp.take_along_axis(
            reads, jnp.clip(i - 1, 0, Lr - 1), axis=1)
        s = jnp.where((cb == rb) & (cb < 4), MATCH, MISMATCH)
        valid = (i >= 1) & (i <= rlens[:, None])
        return jnp.where(valid, s, NEG).astype(jnp.int32)

    def colmax_left(f):
        """Within-column center-gap closure: f[b] = max_k<=b f[k]+(b-k)G."""
        t = f - bidx * g
        t = jax.lax.associative_scan(jnp.maximum, t, axis=1)
        return jnp.maximum(f, t + bidx * g)

    # ---- forward ----
    i0 = bidx - W2
    F0 = jnp.where((i0 >= 0) & (i0 <= rlens[:, None]), i0 * g, NEG)

    def fstep(Fprev, j):
        s = sub_col(j)
        diag = Fprev + s
        up = jnp.concatenate([Fprev[:, 1:], jnp.full((P, 1), NEG,
                                                     jnp.int32)], axis=1) + g
        f = jnp.maximum(diag, up)
        f = colmax_left(f)
        f = jnp.maximum(f, NEG)
        # columns beyond this pair's center length keep previous state
        f = jnp.where(j <= clens[:, None], f, Fprev)
        return f, f.astype(jnp.int32)

    _, Fstack = jax.lax.scan(fstep, F0,
                             jnp.arange(1, Lc + 1, dtype=jnp.int32))
    F = jnp.concatenate([F0[:, None, :], jnp.swapaxes(Fstack, 0, 1)],
                        axis=1)  # [P, Lc+1, W]

    # ---- deterministic batched traceback (greedy: diag > vert > horiz) ----
    # One canonical optimal path per pair. An F+B on-path mask instead marks
    # ALL co-optimal cells, and indels floating in homopolymers then vote
    # phantom insertions at several columns — measured +2.7% consensus
    # length inflation. Sequential over path steps, vectorized over pairs.
    bt = rlens - clens + W2
    total = jnp.take_along_axis(
        jnp.take_along_axis(F, clens[:, None, None], axis=1)[:, 0, :],
        jnp.clip(bt, 0, W - 1)[:, None], axis=1)[:, 0]
    feasible = (bt >= 0) & (bt < W) & (total > NEG // 2)

    Fflat = F.reshape(P, (Lc + 1) * W)
    pidx = jnp.arange(P)

    def gatherF(j, b):
        idx = jnp.clip(j, 0, Lc) * W + jnp.clip(b, 0, W - 1)
        return jnp.take_along_axis(Fflat, idx[:, None], axis=1)[:, 0]

    S = Lc + W + 8  # path length <= clens + #insertions (<= band width)
    votes0 = jnp.zeros((P, Lc + 1, 5), jnp.int32)
    ins0 = jnp.zeros((P, Lc + 1, K_INS, 4), jnp.int32)

    def tstep(carry, _):
        j, b, run, votes, ins = carry
        i = j + b - W2
        active = feasible & ((j > 0) | (b > W2))
        F_cur = gatherF(j, b)
        cb = jnp.take_along_axis(
            center, jnp.clip(j - 1, 0, Lc - 1)[:, None], axis=1)[:, 0]
        rb = jnp.take_along_axis(
            reads, jnp.clip(i - 1, 0, Lr - 1)[:, None], axis=1)[:, 0]
        sub = jnp.where((cb == rb) & (cb < 4), MATCH, MISMATCH)
        diag = active & (j > 0) & (i >= 1) & (F_cur == gatherF(j - 1, b) + sub)
        vert = (active & ~diag & (j > 0) & (b + 1 < W)
                & (F_cur == gatherF(j - 1, b + 1) + g))
        horiz = active & ~diag & ~vert & (b > 0)
        colc = jnp.clip(j - 1, 0, Lc)
        chan = jnp.where(diag, jnp.clip(rb, 0, 3).astype(jnp.int32), 4)
        votes = votes.at[pidx, colc, chan].add((diag | vert).astype(jnp.int32))
        # horiz consumes read char i (insertion before center pos j);
        # offsets count from the run END (right-justified across reads,
        # consistently — the trace walks the run backward)
        o = jnp.minimum(run, K_INS - 1)
        ins = ins.at[pidx, jnp.clip(j, 0, Lc), o,
                     jnp.clip(rb, 0, 3).astype(jnp.int32)].add(
            horiz.astype(jnp.int32))
        dj = (diag | vert).astype(jnp.int32)
        j2 = j - dj
        b2 = b + vert.astype(jnp.int32) - horiz.astype(jnp.int32)
        run2 = jnp.where(horiz, run + 1, 0)
        return (j2, b2, run2, votes, ins), None

    j0 = clens
    b0 = jnp.clip(bt, 0, W - 1)
    run0 = jnp.zeros((P,), jnp.int32)
    (jf, bf, _, votesP, insP), _ = jax.lax.scan(
        tstep, (j0, b0, run0, votes0, ins0), None, length=S)

    col_votes = jax.ops.segment_sum(votesP, mol_ids, num_segments=M)
    ins_votes = jax.ops.segment_sum(insP, mol_ids, num_segments=M)
    pair_counts = jax.ops.segment_sum(
        feasible.astype(jnp.int32), mol_ids, num_segments=M)
    return col_votes, ins_votes, pair_counts


class BatchedConsensusEngine:
    """Bucketed molecule batches -> device votes -> host assembly.

    Call with a list of per-molecule read lists; returns [(cons, qv)] in
    order, matching ops.poa.consensus_reads dispatch (1 read -> itself,
    2 -> longest, >=3 -> MSA consensus)."""

    def __init__(self, maxreads: int = 20, band: int = 64,
                 max_center_len: int = 4096, mesh=None,
                 data_axis: str = "data"):
        """`mesh`: a jax.sharding.Mesh — pair batches shard over
        `data_axis` and per-molecule votes psum-merge (multi-chip
        consensus as a pipeline mode; results identical to single-chip)."""
        self.band = band
        self.maxreads = maxreads
        self.max_center_len = max_center_len
        self.mesh = mesh
        self.data_axis = data_axis
        self._gran = int(mesh.shape[data_axis]) if mesh is not None else 1
        self._steps: dict = {}

    def _votes(self, c_arr, cl, r_arr, rl, mids, W: int, M: int):
        if self.mesh is None:
            return consensus_votes(jnp.asarray(c_arr), jnp.asarray(cl),
                                   jnp.asarray(r_arr), jnp.asarray(rl),
                                   jnp.asarray(mids), W, M)
        from sicelore_tpu.parallel.consensus_step import (
            make_sharded_consensus_step)
        step = self._steps.get((W, M))
        if step is None:
            step, _ = make_sharded_consensus_step(self.mesh, W, M,
                                                  self.data_axis)
            self._steps[(W, M)] = step
        return step(jnp.asarray(c_arr), jnp.asarray(cl), jnp.asarray(r_arr),
                    jnp.asarray(rl), jnp.asarray(mids))

    def __call__(self, molecules: list[list[bytes]], minps: int = 3,
                 maxps: int = 20):
        results: list = [None] * len(molecules)
        # bucket multi-read molecules by center length
        buckets: dict[int, list[int]] = defaultdict(list)
        for mi, seqs in enumerate(molecules):
            if len(seqs) <= 2:
                results[mi] = poa.consensus_reads(seqs, minps, maxps)
            else:
                c = max(len(s) for s in seqs)
                if c > self.max_center_len:
                    results[mi] = poa.consensus_reads(seqs, minps, maxps)
                else:
                    buckets[max(256, 1 << (c - 1).bit_length())].append(mi)
        W = self.band
        pending = []  # (info, device handles) — all buckets dispatch before
        # any host assembly runs, so vote computation overlaps assembly
        for Lc, idxs in buckets.items():
            # build pair batch
            centers, clens, reads, rlens, mol_ids = [], [], [], [], []
            info = []  # per molecule in bucket: (mi, center_seq, R)
            for m_local, mi in enumerate(idxs):
                seqs = molecules[mi]
                ci = max(range(len(seqs)), key=lambda i: len(seqs[i]))
                cseq = seqs[ci]
                info.append((mi, cseq, len(seqs)))
                for r, s in enumerate(seqs):
                    if r == ci:
                        continue
                    # drop reads whose length diff exceeds the band
                    if abs(len(s) - len(cseq)) >= W // 2 - 4:
                        continue
                    centers.append(cseq)
                    clens.append(len(cseq))
                    reads.append(s[:Lc + W])
                    rlens.append(len(s[:Lc + W]))
                    mol_ids.append(m_local)
            if not centers:
                for mi, cseq, R in info:
                    results[mi] = poa.consensus_reads(molecules[mi], minps,
                                                      maxps)
                continue
            Lr = Lc + W
            P = len(centers)
            Pp = max(8, 1 << (P - 1).bit_length())
            g = self._gran
            Pp = ((Pp + g - 1) // g) * g  # divisible by the mesh data axis
            c_arr = np.full((Pp, Lc), dna.PAD, np.int8)
            r_arr = np.full((Pp, Lr), dna.PAD, np.int8)
            cl = np.zeros(Pp, np.int32)
            rl = np.zeros(Pp, np.int32)
            mids = np.full(Pp, len(info), np.int32)  # overflow segment
            for p in range(P):
                c_arr[p, :clens[p]] = dna.encode(centers[p])
                r_arr[p, :rlens[p]] = dna.encode(reads[p])
                cl[p], rl[p], mids[p] = clens[p], rlens[p], mol_ids[p]
            # pad M to a power of two (bounds compiled-shape diversity;
            # segments beyond len(info) only ever hold padding votes)
            M = max(8, 1 << len(info).bit_length())
            pending.append((info, self._votes(c_arr, cl, r_arr, rl, mids,
                                              W, M)))
        for info, (cv, iv, pc) in pending:
            cv, iv, pc = np.asarray(cv), np.asarray(iv), np.asarray(pc)
            for m_local, (mi, cseq, R) in enumerate(info):
                results[mi] = self._assemble(
                    cseq, cv[m_local], iv[m_local], int(pc[m_local]), maxps)
        return results

    @staticmethod
    def _assemble(center: bytes, col_votes, ins_votes, n_pairs, maxps):
        """Majority consensus + QV from vote tensors (host, vectorized).

        R = n_pairs + 1 (center votes its own base per column; reads
        without an insertion vote gap in insertion columns). Emission
        order per center position j: insertion columns (offset o
        descending — right-justified trace order), then base column j;
        majority-deletion columns are dropped (gap stripped). The
        per-column Python loop this replaces was ~half the engine's
        wall-clock at WTA batch sizes."""
        lc = len(center)
        R = n_pairs + 1
        ccodes = np.minimum(dna.encode(center), 4).astype(np.int64)
        cv = np.asarray(col_votes[:lc])            # [lc, 5]
        iv = np.asarray(ins_votes[:lc + 1])        # [lc+1, K, 4]
        K = K_INS
        # slot layout: row j holds K insertion slots (o = K-1..0) then the
        # base slot; total (lc+1)*(K+1) slots, last row's base slot unused
        S = (lc + 1) * (K + 1)
        code = np.zeros(S, np.int64)
        win = np.zeros(S, np.int64)
        keep = np.zeros(S, bool)
        # insertion slots: argmax base wins iff votes > gap votes (R - sum)
        ib = iv.argmax(axis=2)                     # [lc+1, K]
        ivw = np.take_along_axis(iv, ib[:, :, None], axis=2)[:, :, 0]
        ikeep = (ivw > R - iv.sum(axis=2)) & (ivw > 0)
        slots = (np.arange(lc + 1)[:, None] * (K + 1)
                 + (K - 1 - np.arange(K))[None, :])
        code[slots.ravel()] = ib.ravel()
        win[slots.ravel()] = ivw.ravel()
        keep[slots.ravel()] = ikeep.ravel()
        # base slots: center's own base votes too
        if lc:
            cv = cv.copy()
            np.add.at(cv, (np.arange(lc), ccodes), 1)
            bb = cv.argmax(axis=1)                 # [lc]
            bw = np.take_along_axis(cv, bb[:, None], axis=1)[:, 0]
            bslots = np.arange(lc) * (K + 1) + K
            code[bslots] = bb
            win[bslots] = bw
            keep[bslots] = bb != 4
        code, win = code[keep], win[keep]
        out = np.frombuffer(b"ACGT", np.uint8)[np.minimum(code, 3)].tobytes()
        frac = win / R
        q = np.rint(-10 * np.log10(np.maximum(1.0 - frac, 1e-9)))
        q = np.where(frac >= 1.0, maxps, np.minimum(q, maxps))
        return out, (q.astype(np.uint8) + 33).tobytes()
