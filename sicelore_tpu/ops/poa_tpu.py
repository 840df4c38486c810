"""Batched TPU consensus engine (the spoa replacement's device path).

The reference forks one `spoa` process per molecule (~167 UMIs/s on 20
cores, README.md:1146-1147). Here consensus is a fixed-shape batched
computation:

  * per molecule: center = longest cDNA; every other read forms a
    (center, read) pair
  * a Pallas kernel aligns each pair with banded Needleman-Wunsch
    (match +5 / mismatch -4 / gap -8 — spoa defaults) over a width-32
    diagonal band, 4 pairs interleaved per 128-lane row so every VPU op
    is fully utilized; the F matrix lives in VMEM and a deterministic
    greedy traceback (diag > vert > horiz) runs IN-KERNEL with no inner
    loop (the insertion-run stop cell is one ring max-reduction),
    emitting one packed walk record per center column
  * aligned/insertion CODES are recovered from the records by XLA
    gathers; votes segment-sum per molecule on device; consensus
    assembly (majority + agreement QV + gap stripping, ConsensusMsa
    semantics — utils/ConsensusMsa.java:51-91) also runs on device, and
    only the compacted consensus (1 byte/column: qv<<2 | base) is
    downloaded — the round-2 engine shipped [M, Lc, 5] vote tensors over
    a ~15 MB/s d2h tunnel and ran a 2000-step XLA scan whose per-step
    overhead dominated (measured ~1.3 us per loop iteration; the kernel
    unrolls ALN columns per iteration to amortize it)
  * host decodes strings; 1/2-read molecules short-circuit like the
    reference (Consensus.java:201-206)

Shapes are bucketed (Lc to powers of two, band W static, pair count to
powers of two) so a handful of executables serve any workload. Off-TPU
(CPU tests / fallback) the engine runs the reference jnp formulation
`consensus_votes` + host assembly, which the kernel is asserted equal to
in tests/test_poa_tpu.py.
"""
from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sicelore_tpu.ops import poa
from sicelore_tpu.utils import dna

MATCH, MISMATCH, GAP = poa.MATCH, poa.MISMATCH, poa.GAP
NEG = -(10**7)
K_INS = 4
_ACGT = b"ACGTacgt"  # delete-set for the N/ambiguity screen


# ---------------------------------------------------------------------------
# jnp reference engine (CPU fallback + validation target of the kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("W", "M"))
def consensus_votes(center: jax.Array, clens: jax.Array, reads: jax.Array,
                    rlens: jax.Array, mol_ids: jax.Array, W: int, M: int):
    """Votes for one bucket (jnp reference; the Pallas kernel path below is
    the TPU production engine).

    center [P, Lc] int8 codes, clens [P] int32, reads [P, Lr] int8,
    rlens [P] int32, mol_ids [P] int32 (segment ids < M).
    Returns (col_votes [M, Lc+1, 5] int32 — channels A,C,G,T,gap —
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


# ---------------------------------------------------------------------------
# Pallas band-align kernel (TPU production path)
# ---------------------------------------------------------------------------
#
# Layout: 4 PAIRS INTERLEAVED PER 128-LANE ROW (lane = 4*band + pair_phase,
# W = 32 or 64 by bucket), G = 8 sublane groups per tile -> 32/16 pairs per
# step, and every [G, 128] op is a single fully-utilized VPU row. Minor
# dims are always exactly 128, so nothing pays Mosaic's pad-to-128 tax
# (a [.., W, PP<128] layout padded F to 16.8 MB and blew the 16 MB VMEM).
#
# The kernel consumes PRECOMPUTED diagonal bands (one packed int8 per band
# cell: bits 2-3 = match/mismatch/invalid code of center[j-1] vs
# read[j+b-W2-1], bits 0-1 = the read char itself, built by sliding-window
# static slices in _prep_bands) — so neither the reads nor the center ever
# enter the kernel raw. Per-pair reductions over the band are circular
# ring max-reductions (log2(W) lane-rolls of stride QP*2^k): the rolls
# stay phase-aligned, so each pair reduces over exactly its own W lanes
# and the result lands replicated across them — which is exactly the
# broadcast every later op needs.
#
# The traceback emits ONE packed record per (pair, center column) —
# bstop | be<<6 | diag<<12 | vert<<13 | active<<14 | char<<15 — and packs
# W columns' records into each [G, 128] output row (lane band b holds
# column j with (j-1) mod W == b), so the record store is Lc/W rows per
# block instead of the round-4 Lc+ALN lane-replicated rows: 64x less HBM
# write and, downstream, NO per-slot XLA gathers at all — the aligned
# base code rides in the record (round-4's extract_alignments gathers
# were measured at ~1.0 s of the 2.0 s device floor; the final
# compaction scatter another 0.7 s — see tools/profile_consensus*.py).
#
# Feasibility ("can (clen, bt) be reached inside the band without
# consuming read chars beyond rlen?") is tracked by a parallel 0/1
# reachability DP — equivalent to the jnp reference's score threshold:
# there any invalid step costs -1e7, unrecoverable, while every fully-
# valid path scores > -8*(Lc+W) > NEG//2.

ALN = 16        # columns unrolled per loop iteration (a fori_loop
                # iteration costs ~1.3 us of fixed overhead on this
                # target) and the traceback record store batch
GRP = 8         # sublane groups per tile (Lc = 2048 fallback)


def g_for(Lc: int) -> int:
    """Sublane groups per kernel block: 16 halves the block count and
    amortizes per-op issue overhead (the kernel is issue/latency bound —
    ~480 cycles/column for ~60 [G,128] ops, tools/profile_consensus_
    device.py) but the F scratch is (Lc+1)*G*512 B, so Lc = 2048 keeps
    G = 8 to fit the 16 MB VMEM."""
    return 16 if Lc <= 1024 else GRP



def w_for(Lc: int) -> int:
    """Band width per center-length bucket: alignment drift grows ~sqrt(L)
    (random indel imbalance), so short molecules ride the cheap 32-band
    (4 pairs/lane-row) and longer ones the 64-band (2 pairs/lane-row) —
    at 5% read error a +-16 band was measured to corrupt ~5% of ~1 kb
    consensuses while +-32 matches the host engine."""
    return 32 if Lc <= 512 else 64


def padl_for(W: int) -> int:
    """Top PAD of the read columns (see band_align_pallas)."""
    return W // 2 + 1


def pp_step(Lc: int) -> int:
    """Pairs per lax.map step: (128 // W) lane phases * g_for groups."""
    return (128 // w_for(Lc)) * g_for(Lc)


def _band_align_kernel(subs_ref, lens_ref, tb_ref, feas_ref, F, *,
                       Lc: int, W: int):
    """Banded NW forward + greedy traceback records for pp_step(Lc) pairs.

    subs [Lc, G, 128] i8 packed diagonal bands (bits 2-3: 0 match /
    1 mismatch / 2 invalid; bits 0-1: read char); lens [2, G, 128] i32
    (row 0 rlen, row 1 clen, replicated per pair's lanes). Outputs
    tb [Lc//W, G, 128] i32 — lane with band b of row r records column
    j = r*W + b + 1 as bstop | be<<6 | diag<<12 | vert<<13 | active<<14
    | char<<15 — and feas [2, G, 128] i32 (row 0 feasibility, row 1 the
    j = 0 insertion-drain record). Scratch: F [Lc+1, G, 128] i32.
    """
    W2 = W // 2
    QP = 128 // W
    G = g_for(Lc)
    g = jnp.int32(GAP)
    neg = jnp.int32(NEG)
    zero = jnp.zeros((G, 128), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
    band = lane // QP                                    # 0..W-1
    rlen = lens_ref[0:1].reshape(G, 128) + zero
    clen = lens_ref[1:2].reshape(G, 128) + zero

    def m(c):
        """bool -> 0/1 int32 (scalar where-branches would demand i1
        relayouts to replicated layouts Mosaic cannot produce)."""
        return jnp.where(c, zero + 1, zero)

    def shift_band(x, sh, fill):
        """x[band b] <- x[b - sh] within each pair's ring (sh static)."""
        r = pltpu.roll(x, (sh * QP) % 128, axis=1)
        if sh >= 0:
            return jnp.where(band >= sh, r, zero + fill)
        return jnp.where(band < W + sh, r, zero + fill)

    def ring_max(x):
        """Max over each pair's W band lanes, replicated back to them."""
        sh = 1
        while sh < W:
            x = jnp.maximum(x, pltpu.roll(x, (sh * QP) % 128, axis=1))
            sh *= 2
        return x

    def colmax_left(f):
        """f[b] = max_k<=b f[k] + (b-k)*G  (center-gap run closure)."""
        t = f - band * g
        sh = 1
        while sh < W:
            t = jnp.maximum(t, shift_band(t, sh, neg))
            sh *= 2
        return jnp.maximum(f, t + band * g)

    def decode(j):
        """subs column j: (score [G,128] i32, valid 0/1, char 0..3)."""
        s8 = subs_ref[j - 1].astype(jnp.int32)
        code = s8 >> 2
        ch = s8 & 3
        is_m = m(code == 0)
        is_x = m(code == 1)
        sc = is_m * MATCH + is_x * MISMATCH + (1 - is_m - is_x) * neg
        return sc, is_m + is_x, ch

    i0 = band - W2
    valid0 = m(i0 >= 0) * m(i0 <= rlen)
    F0 = valid0 * (i0 * g) + (1 - valid0) * neg
    F[0] = F0

    def fwd_blk(blk, f):
        j0 = blk * ALN
        for u in range(ALN):                             # unrolled columns
            j = j0 + (u + 1)
            sc, _, _ = decode(j)
            diag = f + sc
            up = shift_band(f, -1, neg) + g
            fn = jnp.maximum(diag, up)
            fn = colmax_left(fn)
            fn = jnp.maximum(fn, neg)
            inrange = m(j <= clen)
            f = inrange * fn + (1 - inrange) * f
            F[j] = f
        return f

    ffin = jax.lax.fori_loop(0, Lc // ALN, fwd_blk, F0)  # == F[clen] rows

    # ---- feasibility: the jnp reference's score threshold (any invalid
    # step costs NEG, unrecoverable; every fully-valid path scores
    # > -8*(Lc+W) > NEG//2) — a parallel reachability DP measured ~25%
    # of the forward pass for the same answer ----
    bt = rlen - clen + W2
    btc = jnp.clip(bt, 0, W - 1)
    total = ring_max(ffin * m(band == btc) + neg * (1 - m(band == btc)))
    feasible = m(bt >= 0) * m(bt < W) * m(total > neg // 2)
    feas_ref[0] = feasible

    # ---- traceback (j descending); W columns' records accumulate into
    # one [G, 128] row (lane band b <- column with (j-1) mod W == b), so
    # each record row stores once per W columns ----
    def tb_blk(blkr, carry):
        b, frozen, fj, racc = carry                      # fj = F[j]
        blk = Lc // ALN - 1 - blkr
        j0 = blk * ALN
        for u in range(ALN - 1, -1, -1):
            j = j0 + (u + 1)
            sc, valid, _ = decode(j)
            fjm1 = F[j - 1]
            diag_m = valid * m(fj == fjm1 + sc)
            vert_m = ((1 - diag_m) * m(band + 1 < W)
                      * m(fj == shift_band(fjm1, -1, neg) + g))
            # one ring reduction finds the stop cell, its move type AND
            # its read char: larger band dominates; lower bits ride along
            stop_ok = (jnp.maximum(jnp.maximum(diag_m, vert_m),
                                   m(band == 0)) * m(band <= b))
            chb = subs_ref[j - 1].astype(jnp.int32) & 3
            cand = stop_ok * ((band << 4) | (diag_m << 3) | (vert_m << 2)
                              | chb) - (1 - stop_ok)
            top = ring_max(cand)
            bstop = top >> 4
            stop_diag = (top >> 3) & 1
            stop_vert = (top >> 2) & 1
            ch = top & 3
            stuck = (1 - stop_diag) * (1 - stop_vert)
            active = feasible * (1 - frozen) * m(j <= clen)
            rec = (bstop | (b << 6)
                   | ((stop_diag * active) << 12)
                   | ((stop_vert * active) << 13)
                   | (active << 14) | (ch << 15))
            racc = jnp.where(band == (j0 + u) % W, rec, racc)
            frozen = jnp.maximum(frozen, active * stuck)
            move = active * (1 - stuck)
            b = b * (1 - move) + (bstop + stop_vert) * move
            fj = fjm1

        @pl.when(j0 % W == 0)
        def _store():
            tb_ref[pl.ds(j0 // W, 1)] = racc[None]
        return b, frozen, fj, racc

    b, frozen, _, _ = jax.lax.fori_loop(
        0, Lc // ALN, tb_blk, (btc, zero, F[Lc], zero))
    # j = 0 drain: remaining insertions (read prefix before center start;
    # the walk stops at band W2 — read position 0)
    bstop0 = jnp.minimum(zero + W2, b)
    active0 = feasible * (1 - frozen) * m(b > W2)
    feas_ref[1] = bstop0 | (b << 6) | (active0 << 14)


def unpack2bit_cols(packed: jax.Array) -> jax.Array:
    """[E, P] u8 (4 bases/byte along rows) -> [4E, P] i8 codes."""
    E, P = packed.shape
    parts = [((packed >> s) & jnp.uint8(3)).astype(jnp.int8)
             for s in (0, 2, 4, 6)]
    return jnp.stack(parts, axis=1).reshape(E * 4, P)


def unpack2bit_rows(packed: jax.Array) -> jax.Array:
    """[M, E] u8 (4 bases/byte along columns) -> [M, 4E] i8 codes."""
    M, E = packed.shape
    parts = [((packed >> s) & jnp.uint8(3)).astype(jnp.int8)
             for s in (0, 2, 4, 6)]
    return jnp.stack(parts, axis=2).reshape(M, E * 4)


def pack2bit_cols_np(codes: np.ndarray) -> np.ndarray:
    """[4E, P] int8 codes -> [E, P] u8 (codes > 3 clip to 3: device pads
    are masked by lens, and N-containing molecules never reach here)."""
    c = np.minimum(codes, 3).astype(np.uint8)
    return c[0::4] | (c[1::4] << 2) | (c[2::4] << 4) | (c[3::4] << 6)


def pack2bit_rows_np(codes: np.ndarray) -> np.ndarray:
    """[M, 4E] int8 codes -> [M, E] u8."""
    c = np.minimum(codes, 3).astype(np.uint8)
    return (c[:, 0::4] | (c[:, 1::4] << 2) | (c[:, 2::4] << 4)
            | (c[:, 3::4] << 6))


@functools.partial(jax.jit, static_argnames=("Lc",))
def _prep_bands(cent_p, clens, reads_p, rlens, Lc: int):
    """Build the interleaved packed diagonal bands + lens rows.

    cent_p [P, Lc] i8, reads_p [P, Lrp] i8 (top-padded by PADL), clens/
    rlens [P] i32; P a multiple of pp_step(Lc). Returns
    (subs [Nc, Lc, G, 128] i8 — bits 2-3 match/mismatch/invalid code,
    bits 0-1 read char — lens [Nc, 2, G, 128] i32), lane = QP*band+phase."""
    P, Lrp = reads_p.shape
    W = w_for(Lc)
    W2 = W // 2
    QP = 128 // W
    Nc = P // pp_step(Lc)
    G = g_for(Lc)
    jj = jnp.arange(1, Lc + 1, dtype=jnp.int32)[:, None]  # [Lc, 1]
    bb = jnp.arange(W, dtype=jnp.int32)[None, :]          # [1, W]
    i = jj + bb - W2                                      # [Lc, W]
    # read char for cell (column j, band b) sits at padded index
    # (j-1) + b + 1: a sliding window = W static slices, no gather
    rch = jnp.stack([reads_p[:, b + 1:b + 1 + Lc] for b in range(W)],
                    axis=2)                               # [P, Lc, W] i8
    cch = cent_p[:, :, None]
    code = jnp.where(cch == rch, jnp.int8(0), jnp.int8(1))
    valid = (i[None] >= 1) & (i[None] <= rlens[:, None, None])
    code = jnp.where(valid, code, jnp.int8(2))
    subs = (code << 2) | rch                              # [P, Lc, W] i8
    # pair p = nc*PP_STEP + g*QP + q  ->  [Nc, Lc, G, lane=QP*b+q]
    subs = subs.reshape(Nc, G, QP, Lc, W)
    subs = jnp.transpose(subs, (0, 3, 1, 4, 2)).reshape(
        Nc, Lc, G, 128)
    lens2 = jnp.stack([rlens, clens], axis=0).reshape(
        2, Nc, G, QP)[:, :, :, None, :]                   # [2, Nc, G, 1, Q]
    lens2 = jnp.broadcast_to(lens2, (2, Nc, G, W, QP)).reshape(
        2, Nc, G, 128)
    return subs, jnp.transpose(lens2, (1, 0, 2, 3))


@functools.partial(jax.jit, static_argnames=("Lc", "interpret"))
def band_align_pallas(reads2b: jax.Array, rlens: jax.Array,
                      mids: jax.Array, cmol2b: jax.Array, clm: jax.Array,
                      Lc: int, interpret: bool = False):
    """Align P (center, read) pairs from the 2-bit DEDUPLICATED uploads.

    reads2b [Lrp//4, P] u8 — pair p's read 2-bit packed text-major,
    starting at unpacked row PADL (Lrp >= padl_for(W) + Lc + W, mult of
    128); rlens [P] i32; mids [P] i32 nondecreasing molecule ids < M2;
    cmol2b [M2, Lc//4] u8 2-bit packed per-MOLECULE centers; clm [M2]
    i32. Each pair's center is gathered on device from its molecule row —
    the round-4 engine uploaded the center once PER PAIR plus once per
    molecule in byte codes, 10x the bytes over a ~10 MB/s tunnel.
    Returns (aligned [P, Lc+1] i8 — 0..3 read base on diag / 4 deletion /
    5 none — ins_votes [P, Lc+1, K_INS, 4] i8 with row j = insertions
    before center pos j, feasible [P] i32, cmol [M2, Lc] i8 unpacked)."""
    E, P = reads2b.shape
    W = w_for(Lc)
    QP = 128 // W
    R = Lc // W
    assert P % pp_step(Lc) == 0 and Lc % ALN == 0 and Lc % W == 0
    reads_tm = unpack2bit_cols(reads2b)                  # [Lrp, P] i8
    reads_p = jnp.transpose(reads_tm)                    # [P, Lrp] i8
    cmol = unpack2bit_rows(cmol2b)                       # [M2, Lc] i8
    cent_p = jnp.take(cmol, mids, axis=0)                # [P, Lc] i8
    clens = jnp.take(clm, mids)
    subs, lens = _prep_bands(cent_p, clens, reads_p, rlens, Lc)
    kernel = functools.partial(_band_align_kernel, Lc=Lc, W=W)

    def one_block(args):
        sb, ln = args
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((R, g_for(Lc), 128), jnp.int32),
                jax.ShapeDtypeStruct((2, g_for(Lc), 128), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Lc + 1, g_for(Lc), 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=pp_step(Lc) * Lc * W * 12, transcendentals=0,
                bytes_accessed=Lc * g_for(Lc) * 128 * 5),
            interpret=interpret,
        )(sb, ln)

    tb4, feas4 = jax.lax.map(one_block, (subs, lens))
    Nc = P // pp_step(Lc)
    # lane with band b of row r holds column j = r*W + b + 1, pair phase q
    t = tb4.reshape(Nc, R, g_for(Lc), W, QP)
    tb_cols = jnp.transpose(t, (0, 2, 4, 1, 3)).reshape(P, Lc)
    drain = feas4[:, 1, :, :QP].reshape(P, 1)            # band-0 lanes
    feasible = feas4[:, 0, :, :QP].reshape(P)
    tb = jnp.concatenate([tb_cols, drain], axis=1)       # [P, Lc+1]
    aligned, ins_votes = extract_alignments(tb, reads_p, Lc, W)
    return aligned, ins_votes, feasible, cmol


@functools.partial(jax.jit, static_argnames=("Lc", "W"))
def extract_alignments(tb: jax.Array, reads_p: jax.Array, Lc: int, W: int):
    """Unpack the kernel's walk records into aligned codes + insertion
    votes — NO gathers: the aligned base rides in the record and the
    insertion-run chars resolve through W static sliding slices of the
    reads (round-4's take_along_axis formulation was ~1.0 s of the 2.0 s
    device floor at [4096, 1025]; this is ~60 ms).

    tb [P, Lc+1] i32 packed bstop | be<<6 | diag<<12 | vert<<13 |
    active<<14 | char<<15; slot t < Lc records column j = t+1, slot Lc
    the j = 0 insertion drain. Returns (aligned [P, Lc+1] i8,
    ins_votes [P, Lc+1, K_INS, 4] i8 with row j = insertions before
    center pos j). A horizontal run longer than K_INS piles every excess
    char's vote into the last offset slot, exactly like the jnp
    reference's `o = min(run, K_INS-1)` accumulation (the round-3
    single-char truncation diverged there — caught by the
    test_pallas_parity_* suite, ADVICE r4)."""
    P, Lc1 = tb.shape
    bstop = tb & 63
    be = (tb >> 6) & 63
    diag = (tb >> 12) & 1
    vert = (tb >> 13) & 1
    active = (tb >> 14) & 1
    ch = (tb >> 15) & 3
    slot = jnp.arange(Lc1, dtype=jnp.int32)[None, :]
    emitted = jnp.where(diag > 0, ch, jnp.where(vert > 0, 4, 5))
    # slot t's record describes the move INTO column t's base slot; the
    # drain slot emits no base
    aligned = jnp.where(slot < Lc, emitted, 5).astype(jnp.int8)

    # insertion votes: the run consumed read chars at band lanes
    # (bstop, be], read index j + lane; offset o counts from the run END
    # (right-justified trace order), o >= K_INS-1 piles into the last slot
    K = K_INS
    am, bem, bsm = active > 0, be, bstop
    acc = [[jnp.zeros((P, Lc1), jnp.int8) for _ in range(4)]
           for _ in range(K)]
    for b in range(1, W):
        # main slots t < Lc read index (t+1)+b; drain slot index b
        rc = jnp.concatenate(
            [reads_p[:, 1 + b:1 + b + Lc], reads_p[:, b:b + 1]], axis=1)
        in_run = am & (bsm < b)
        for c in range(4):
            eq = (rc == c) & in_run
            for o in range(K - 1):
                acc[o][c] = acc[o][c] + (eq & (bem - o == b)).astype(
                    jnp.int8)
            acc[K - 1][c] = acc[K - 1][c] + (
                eq & (b <= bem - (K - 1))).astype(jnp.int8)
    ins_by_slot = jnp.stack(
        [jnp.stack(a, axis=-1) for a in acc], axis=2)     # [P, Lc+1, K, 4]
    # reorder to insertion rows: row 0 = drain (slot Lc), row j = slot j-1
    ins_votes = jnp.concatenate([ins_by_slot[:, Lc:], ins_by_slot[:, :Lc]],
                                axis=1)
    return aligned, ins_votes


@functools.partial(jax.jit, static_argnames=("M",))
def segment_votes(aligned, ins, feasible, mids, M: int):
    """Per-pair alignments -> per-molecule vote tensors (the additive,
    psum-mergeable half of the assembly — the multi-chip step psums these
    across the data axis before assemble_votes).

    aligned [P, Lc+1] int (0..3 base / 4 del / 5 none), ins
    [P, Lc+1, K_INS, 4] i8, feasible [P], mids [P] segment ids < M.
    Returns (cv [M, Lc, 5] i32, iv [M, Lc+1, K_INS, 4] i32, pc [M])."""
    Lc = aligned.shape[1] - 1
    ch5 = jnp.arange(5, dtype=jnp.int32)
    # (an MXU-matmul segment-sum formulation measured ~30% slower here
    # than XLA's scatter-add — padded segment rows outweigh the MXU win)
    cv = jax.ops.segment_sum(
        (aligned[:, :Lc, None] == ch5).astype(jnp.int32), mids,
        num_segments=M)                                     # [M, Lc, 5]
    iv = jax.ops.segment_sum(ins.astype(jnp.int32), mids,
                             num_segments=M)                # [M, Lc+1, K, 4]
    pc = jax.ops.segment_sum(feasible.astype(jnp.int32), mids,
                             num_segments=M)
    return cv, iv, pc


@functools.partial(jax.jit, static_argnames=("maxps", "out_cols"))
def assemble_votes(cv, iv, pc, centers_mol, clen_mol, maxps: int,
                   out_cols: int):
    """Per-molecule vote tensors -> compacted consensus bytes, on device.

    cv [M, Lc, 5] i32, iv [M, Lc+1, K_INS, 4] i32, pc [M] (from
    segment_votes, possibly psum-merged across chips), centers_mol
    [M, Lc] i8, clen_mol [M] i32. Returns (packed [M, out_cols] u8 —
    qv<<2 | base — out_len [M], pair_counts [M], overflow [M] bool).
    Assembly semantics == BatchedConsensusEngine host _assemble ==
    ConsensusMsa.process (utils/ConsensusMsa.java:51-91)."""
    M, Lc = cv.shape[:2]
    Lc1 = Lc + 1
    K = K_INS
    ch5 = jnp.arange(5, dtype=jnp.int32)
    R = pc + 1                                              # center votes too
    cols = jnp.arange(Lc, dtype=jnp.int32)
    cmask = cols[None, :] < clen_mol[:, None]               # [M, Lc]
    conh = ((jnp.minimum(centers_mol.astype(jnp.int32), 4)[..., None] == ch5)
            & cmask[..., None])
    cv = cv + conh.astype(jnp.int32)

    # base slots
    bb = jnp.argmax(cv, axis=2)                             # [M, Lc]
    bw = jnp.take_along_axis(cv, bb[..., None], axis=2)[..., 0]
    keep_base = (bb != 4) & cmask
    # insertion slots: argmax base wins iff votes > gap votes (R - sum)
    ib = jnp.argmax(iv, axis=3)                             # [M, Lc+1, K]
    ivw = jnp.take_along_axis(iv, ib[..., None], axis=3)[..., 0]
    rmask = (jnp.arange(Lc1, dtype=jnp.int32)[None, :]
             <= clen_mol[:, None])                          # [M, Lc+1]
    ikeep = ((ivw > (R[:, None, None] - iv.sum(axis=3))) & (ivw > 0)
             & rmask[..., None])

    def qv_of(win, keep):
        frac = win / jnp.maximum(R, 1)[:, None].astype(jnp.float32)
        q = jnp.rint(-10.0 * jnp.log10(jnp.maximum(1.0 - frac, 1e-9)))
        q = jnp.where(frac >= 1.0, maxps, jnp.minimum(q, maxps))
        return jnp.where(keep, q, 0.0).astype(jnp.int32)

    # slot layout per center row j: K insertion slots (o = K-1..0, i.e.
    # right-justified trace order) then the base slot
    ins_code = ib[:, :, ::-1]                               # o descending
    ins_win = ivw[:, :, ::-1]
    ins_keep = ikeep[:, :, ::-1]
    base_code = jnp.concatenate(
        [bb, jnp.zeros((M, 1), bb.dtype)], axis=1)[:, :, None]  # [M, Lc+1, 1]
    base_win = jnp.concatenate(
        [bw, jnp.zeros((M, 1), bw.dtype)], axis=1)[:, :, None]
    base_keep = jnp.concatenate(
        [keep_base, jnp.zeros((M, 1), bool)], axis=1)[:, :, None]
    code = jnp.concatenate([ins_code, base_code], axis=2).reshape(M, -1)
    win = jnp.concatenate([ins_win.astype(jnp.int32),
                           base_win.astype(jnp.int32)], axis=2).reshape(M, -1)
    keep = jnp.concatenate([ins_keep, base_keep], axis=2).reshape(M, -1)

    q = qv_of(win.astype(jnp.float32), keep)
    val = ((q.astype(jnp.int32) << 2) | jnp.minimum(code, 3))
    out_idx = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    out_len = out_idx[:, -1] + 1
    # stream compaction WITHOUT scatter: per-row sort of (target_idx<<8 |
    # value) with dropped slots keyed past every kept one — kept slots'
    # out_idx is strictly increasing, so the sorted prefix IS the
    # compacted stream. (The round-4 .at[].max scatter over [M, S] was
    # ~0.7 s on TPU; this sort is ~30 ms at [1024, 5125].)
    S = keep.shape[1]
    pk = jnp.where(keep, (out_idx << 8) | val, (S << 8) | 0xFF)
    srt = jax.lax.sort(pk, dimension=1)[:, :out_cols]
    packed = jnp.where((srt >> 8) < S, srt & 0xFF, 0).astype(jnp.uint8)
    overflow = out_len > out_cols
    return packed, out_len, pc, overflow


@functools.partial(jax.jit, static_argnames=("M", "maxps", "out_cols"))
def votes_assemble(aligned, ins, feasible, mids, centers_mol, clen_mol,
                   M: int, maxps: int, out_cols: int):
    """segment_votes + assemble_votes in one call (single-chip path)."""
    cv, iv, pc = segment_votes(aligned, ins, feasible, mids, M)
    return assemble_votes(cv, iv, pc, centers_mol, clen_mol, maxps,
                          out_cols)


class BatchedConsensusEngine:
    """Bucketed molecule batches -> device alignment + assembly -> strings.

    Call with a list of per-molecule read lists; returns [(cons, qv)] in
    order, matching ops.poa.consensus_reads dispatch (1 read -> itself,
    2 -> longest, >=3 -> MSA consensus)."""

    def __init__(self, maxreads: int = 20, band: int = 64,
                 max_center_len: int = 2048, mesh=None,
                 data_axis: str = "data", force: str | None = None):
        """`mesh`: a jax.sharding.Mesh — pair batches shard over
        `data_axis` and per-molecule votes psum-merge (multi-chip
        consensus as a pipeline mode; results identical to single-chip).
        `band` only affects the jnp fallback path; the Pallas kernel's
        band derives from the center-length bucket (w_for)."""
        self.band = band
        self.maxreads = maxreads
        self.max_center_len = max_center_len
        self.mesh = mesh
        self.data_axis = data_axis
        self._gran = int(mesh.shape[data_axis]) if mesh is not None else 1
        try:
            self._mesh_tpu = (mesh is not None and
                              mesh.devices.flat[0].platform == "tpu")
        except Exception:
            self._mesh_tpu = False
        self._steps: dict = {}
        # force: "pallas-interpret" runs the production Pallas path in
        # interpret mode off-TPU (parity tests); "jnp" forces the fallback
        self._interp = force == "pallas-interpret"
        try:
            self._on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            self._on_tpu = False
        if self._interp:
            self._on_tpu = True
        elif force == "jnp":
            self._on_tpu = False

    # -- jnp fallback (CPU tests / multihost CPU meshes) ------------------

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
                 maxps: int = 20, refine: bool = False):
        """refine=True runs a SECOND alignment pass with the first-pass
        consensus as the center (every read realigns to it and re-votes) —
        the cheap approximation of spoa's graph refinement. Costs ~2x
        device time; accuracy deltas are tabulated in
        docs/CONSENSUS_ACCURACY.md."""
        results = self._one_pass(molecules, minps, maxps, None)
        if not refine:
            return results
        centers_map = {}
        for mi, seqs in enumerate(molecules):
            if len(seqs) > 2 and results[mi] is not None:
                c = results[mi][0]
                if len(c) and len(c) <= self.max_center_len:
                    centers_map[mi] = c
        if centers_map:
            refined = self._one_pass(molecules, minps, maxps, centers_map)
            for mi in centers_map:
                results[mi] = refined[mi]
        return results

    def _one_pass(self, molecules, minps, maxps, centers_map):
        results: list = [None] * len(molecules)
        # maxps > 63 cannot pack into the 6 qv bits of the compacted
        # consensus byte (ADVICE r3) — serve those from the jnp engine.
        # With a mesh, the production sharded Pallas path runs on TPU
        # meshes (or interpret mode in tests); CPU meshes take the jnp
        # sharded step (Pallas cannot compile for host CPU)
        pallas = maxps <= 63 and (
            self._interp or (self._on_tpu and
                             (self.mesh is None or self._mesh_tpu)))
        # bucket multi-read molecules by center length
        buckets: dict[int, list[int]] = defaultdict(list)
        for mi, seqs in enumerate(molecules):
            if centers_map is not None and mi not in centers_map:
                continue
            if len(seqs) <= 2:
                results[mi] = poa.consensus_reads(seqs, minps, maxps)
            else:
                c = (len(centers_map[mi]) if centers_map is not None
                     else max(len(s) for s in seqs))
                if c > self.max_center_len or (
                        pallas and any(s.translate(None, _ACGT) for s in
                                       seqs)):
                    # 2-bit device uploads cannot carry N/ambiguity codes;
                    # N-containing molecules (rare in ONT basecalls) take
                    # the host engine — same algorithm, N never matches
                    results[mi] = poa.consensus_reads(seqs, minps, maxps)
                else:
                    buckets[max(256, 1 << (c - 1).bit_length())].append(mi)
        if pallas:
            self._run_pallas(molecules, buckets, results, minps, maxps,
                             centers_map)
        else:
            self._run_jnp(molecules, buckets, results, minps, maxps,
                          centers_map)
        return results

    def _build_bucket(self, molecules, idxs, Lc, W, centers_map=None):
        """Pack one bucket's pair batch; returns None when no pairs.

        With centers_map the given consensus is the center and EVERY read
        forms a pair (refine pass); otherwise the longest read is the
        center and the others pair against it."""
        centers, clens, reads, rlens, mol_ids = [], [], [], [], []
        info = []  # per molecule in bucket: (mi, center_seq, R)
        for m_local, mi in enumerate(idxs):
            seqs = molecules[mi]
            if centers_map is not None:
                cseq = centers_map[mi]
                ci = -1
            else:
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
        return info, centers, clens, reads, rlens, mol_ids

    def _run_jnp(self, molecules, buckets, results, minps, maxps,
                 centers_map=None):
        W = self.band
        pending = []  # (info, device handles) — all buckets dispatch before
        # any host assembly runs, so vote computation overlaps assembly
        for Lc, idxs in buckets.items():
            built = self._build_bucket(molecules, idxs, Lc, W,
                                       centers_map)
            info, centers, clens, reads, rlens, mol_ids = built
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

    @staticmethod
    def _grid(n: int, step: int = 1) -> int:
        """Smallest {1, 1.5} x pow2 multiple of `step` >= n — a finer
        padded-size grid than pow2 (worst-case 1.5x vs 2x row waste) at
        ~1.6x the compiled-shape count, all AOT-cached."""
        k = step
        while k < n:
            if k * 3 // 2 >= n and (k * 3 // 2) % step == 0:
                return k * 3 // 2
            k *= 2
        return k

    def _bucket_fn(self, Lc: int, Pp: int, n2: int, maxps: int,
                   out_cols: int):
        """Fused align+assemble for one bucket shape, AOT-export-cached.

        Returns ONE merged [n2, out_cols + 5] u8 array (consensus bytes |
        out_len LE32 | overflow), sliced to the real molecule rows INSIDE
        the jit: the previous three eagerly-sliced downloads cost ~74 ms
        of RPC per slice op plus a synchronous d2h round trip each — the
        whole engine was download-bound (measured 2.3s of 2.7s)."""
        key = (Lc, Pp, n2, maxps, out_cols)
        fn = self._steps.get(key)
        if fn is None:
            interp = self._interp
            W = w_for(Lc)
            E = ((padl_for(W) + Lc + W + 127) // 128) * 128 // 4

            def fused(blob):
                # ONE coalesced upload per bucket (the tunnel pays a
                # per-transfer RPC round trip; five arrays cost five)
                o1 = E * Pp
                o2 = o1 + 4 * Pp
                o3 = o2 + 4 * Pp
                o4 = o3 + n2 * (Lc // 4)
                reads2b = blob[:o1].reshape(E, Pp)
                rl = jax.lax.bitcast_convert_type(
                    blob[o1:o2].reshape(Pp, 4), jnp.int32)
                mids = jax.lax.bitcast_convert_type(
                    blob[o2:o3].reshape(Pp, 4), jnp.int32)
                cmol2b = blob[o3:o4].reshape(n2, Lc // 4)
                clm = jax.lax.bitcast_convert_type(
                    blob[o4:].reshape(n2, 4), jnp.int32)
                aligned, ins, feas, cmol = band_align_pallas(
                    reads2b, rl, mids, cmol2b, clm, Lc, interpret=interp)
                packed, out_len, pc, overflow = votes_assemble(
                    aligned, ins, feas, mids, cmol, clm, n2, maxps,
                    out_cols)
                ol = out_len[:, None].astype(jnp.uint32)
                lb = jnp.concatenate(
                    [((ol >> s) & 0xFF).astype(jnp.uint8)
                     for s in (0, 8, 16, 24)], axis=1)
                ov = overflow[:, None].astype(jnp.uint8)
                return jnp.concatenate([packed, lb, ov], axis=1)

            if not interp:
                from sicelore_tpu.utils import aotcache
                fn = aotcache.wrap(
                    "consensus", f"{Lc}|{Pp}|{n2}|{maxps}|{out_cols}",
                    fused)
            else:
                fn = fused
            self._steps[key] = fn
        return fn

    def _bucket_fn_sharded(self, Lc, Pp, n2, maxps, out_cols):
        """Production multi-chip bucket step (pairs sharded over the data
        axis, votes psum-merged, assembly replicated); interpret mode
        serves CPU-mesh tests. Results byte-identical to single chip."""
        key = ("sh", Lc, Pp, n2, maxps, out_cols)
        fn = self._steps.get(key)
        if fn is None:
            from sicelore_tpu.parallel.consensus_step import (
                make_sharded_bucket_fn)
            fn = make_sharded_bucket_fn(
                self.mesh, Lc, Pp, n2, maxps, out_cols, self.data_axis,
                interpret=self._interp)
            self._steps[key] = fn
        return fn

    def _run_pallas(self, molecules, buckets, results, minps, maxps,
                    centers_map=None):
        """TPU path: Pallas band-align + on-device assembly. Uploads are
        2-bit packed and deduplicated (centers once per MOLECULE, gathered
        to pairs on device) — the round-4 byte-dense pair-replicated
        upload was 14.9 MB/2000 molecules over a ~10 MB/s tunnel, ~1.1 s
        of the 3.4 s wall; this ships ~1.5 MB. Downloads only the
        compacted per-molecule consensus bytes."""
        pending = []
        for Lc, idxs in buckets.items():
            W = w_for(Lc)
            PADL = padl_for(W)
            built = self._build_bucket(molecules, idxs, Lc, W,
                                       centers_map)
            info, centers, clens, reads, rlens, mol_ids = built
            if not centers:
                for mi, cseq, R in info:
                    results[mi] = poa.consensus_reads(molecules[mi], minps,
                                                      maxps)
                continue
            P = len(centers)
            Pp = self._grid(P, pp_step(Lc) * self._gran)
            n = len(info)
            n2 = self._grid(max(8, n + 1))
            Lr = Lc + W
            Lrp = ((PADL + Lr + 127) // 128) * 128
            # pair-on-lane layout (see band_align_pallas)
            rT = np.full((Lrp, Pp), 3, np.int8)
            rl = np.zeros(Pp, np.int32)
            mids = np.full(Pp, n, np.int32)  # overflow segment
            cmol = np.zeros((n2, Lc), np.int8)
            clm = np.zeros(n2, np.int32)
            for m_local, (mi, cseq, R) in enumerate(info):
                cmol[m_local, :len(cseq)] = dna.encode(cseq)
                clm[m_local] = len(cseq)
            for p in range(P):
                rT[PADL:PADL + rlens[p], p] = dna.encode(reads[p])
                rl[p], mids[p] = rlens[p], mol_ids[p]
            out_cols = Lc + Lc // 8 + 16
            if self.mesh is not None:
                fn = self._bucket_fn_sharded(Lc, Pp, n2, maxps, out_cols)
                merged = fn(jnp.asarray(pack2bit_cols_np(rT)),
                            jnp.asarray(rl), jnp.asarray(mids),
                            jnp.asarray(pack2bit_rows_np(cmol)),
                            jnp.asarray(clm))
            else:
                fused = self._bucket_fn(Lc, Pp, n2, maxps, out_cols)
                blob = np.concatenate([
                    pack2bit_cols_np(rT).ravel(), rl.view(np.uint8),
                    mids.view(np.uint8), pack2bit_rows_np(cmol).ravel(),
                    clm.view(np.uint8)])
                merged = fused(jnp.asarray(blob))
            try:  # overlap the d2h transfers across buckets
                merged.copy_to_host_async()
            except Exception:
                pass
            pending.append((info, merged, out_cols))
        for info, merged, out_cols in pending:
            merged = np.asarray(merged)
            packed = merged[:, :out_cols]
            out_len = (merged[:, out_cols:out_cols + 4]
                       .astype(np.uint32) << np.uint32([0, 8, 16, 24])
                       ).sum(axis=1).astype(np.int64)
            overflow = merged[:, out_cols + 4]
            codes_all = packed & 3
            qs_all = (packed >> 2) + 33
            acgt = np.frombuffer(b"ACGT", np.uint8)
            for m_local, (mi, cseq, R) in enumerate(info):
                if overflow[m_local]:
                    results[mi] = poa.consensus_reads(molecules[mi], minps,
                                                      maxps)
                    continue
                n = int(out_len[m_local])
                cons = acgt[codes_all[m_local, :n]].tobytes()
                qv = qs_all[m_local, :n].astype(np.uint8).tobytes()
                results[mi] = (cons, qv)

    @staticmethod
    def _assemble(center: bytes, col_votes, ins_votes, n_pairs, maxps):
        """Majority consensus + QV from vote tensors (host, vectorized).

        R = n_pairs + 1 (center votes its own base per column; reads
        without an insertion vote gap in insertion columns). Emission
        order per center position j: insertion columns (offset o
        descending — right-justified trace order), then base column j;
        majority-deletion columns are dropped (gap stripped)."""
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
