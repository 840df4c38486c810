"""Cell-barcode whitelist search: tiled Pallas TPU kernel + jnp fallback.

The hot loop of the reference's read scan is the per-read barcode
edit-distance search (jar BarcodeMatchTester/BCnucTwoBitPerBaseEDtester:
enumerate ED-neighborhood of the read's BC window, probe a hash set, track
best + second-best ED). Here: a [reads x barcodes] Myers bit-parallel sweep.
The Pallas kernel tiles (B, N), keeps the PV/MV/score state in VMEM for the
whole text loop (compute-bound; zero HBM traffic for state), and reduces
best / best-index / second-best-ED / end-position in-kernel so only [B, 4]
leaves the chip.

Grid layout: (B/bt, N/nt); the output block for row-tile i is revisited for
every barcode tile j and accumulated in place (index_map (i, j) -> (0, i)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sicelore_tpu.ops import editdist

BIG = 2**30  # sentinel for masked lanes (avoids int32 overflow in +1)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bc_sweep_kernel(nvalid_ref, win_ref, peq_ref, out_ref,
                     *, m: int, W: int, track_pos: bool):
    """One (row-tile, barcode-tile) cell of the whitelist sweep.

    The text loop is FULLY UNROLLED (W is static, ~22): a fori_loop
    iteration costs ~1.3 us of fixed overhead on this target, which at
    W=22 x 2048 grid cells was ~60 ms of pure loop tax per 32k-read
    batch. State lives in vector registers, not VMEM scratch."""
    j = pl.program_id(1)
    bt = win_ref.shape[1]
    nt = peq_ref.shape[1]
    full = jnp.uint32((1 << m) - 1) if m < 32 else jnp.uint32(0xFFFFFFFF)
    hibit = jnp.uint32(m - 1)
    z = jnp.zeros((bt, nt), dtype=jnp.uint32)

    PV = z + full
    MV = z
    score = jnp.full((bt, nt), m, dtype=jnp.int32)
    best = score
    bestpos = jnp.full((bt, nt), -1, dtype=jnp.int32)
    peq_rows = [peq_ref[c, :][None, :] for c in range(4)]

    for t in range(W):
        # [bt, 1] int32 (reshape of a 32-bit vector is a supported no-op;
        # reshaping an i1 mask is not — compare after broadcasting)
        wc = win_ref[t, :][:, None]
        eq = jnp.where(wc == 0, peq_rows[0],
              jnp.where(wc == 1, peq_rows[1],
               jnp.where(wc == 2, peq_rows[2],
                jnp.where(wc == 3, peq_rows[3], z))))
        Xv = eq | MV
        Xh = (((eq & PV) + PV) ^ PV) | eq
        Ph = MV | ~(Xh | PV)
        Mh = PV & Xh
        score = score + ((Ph >> hibit) & jnp.uint32(1)).astype(jnp.int32)
        score = score - ((Mh >> hibit) & jnp.uint32(1)).astype(jnp.int32)
        Ph = Ph << jnp.uint32(1)  # free text start (search variant)
        Mh = Mh << jnp.uint32(1)
        PV = Mh | ~(Xv | Ph)
        MV = Ph & Xv
        improved = score < best
        if track_pos:
            # full-shape t: a bare python-int scalar in this select crashes
            # the Mosaic compile (relayout of a scalar into the vector
            # layout), observed on the unrolled kernel
            bestpos = jnp.where(improved,
                                jnp.full((bt, nt), t, jnp.int32), bestpos)
        best = jnp.minimum(score, best)

    # mask barcode lanes beyond the real whitelist size
    gidx = j * nt + jax.lax.broadcasted_iota(jnp.int32, (bt, nt), 1)
    ed = jnp.where(gidx < nvalid_ref[0], best, BIG)

    # within-tile best / first-argmin / second-best / end position
    b1 = jnp.min(ed, axis=1)
    i1 = jnp.min(jnp.where(ed == b1[:, None], gidx, BIG), axis=1)
    b2 = jnp.min(jnp.where(gidx == i1[:, None], BIG, ed), axis=1)
    pos = jnp.max(jnp.where(gidx == i1[:, None], bestpos, -1), axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = b1
        out_ref[1, :] = i1
        out_ref[2, :] = b2
        out_ref[3, :] = pos

    @pl.when(j > 0)
    def _():
        ob, oi = out_ref[0, :], out_ref[1, :]
        os2, op = out_ref[2, :], out_ref[3, :]
        take_new = b1 < ob
        out_ref[0, :] = jnp.minimum(ob, b1)
        out_ref[1, :] = jnp.where(take_new, i1, oi)
        out_ref[3, :] = jnp.where(take_new, pos, op)
        out_ref[2, :] = jnp.minimum(jnp.maximum(ob, b1), jnp.minimum(os2, b2))


@functools.partial(jax.jit, static_argnames=("m", "bt", "nt", "interpret",
                                             "track_pos"))
def bc_sweep_pallas(windows: jax.Array, peq: jax.Array, nvalid: jax.Array,
                    m: int, bt: int = 256, nt: int = 512,
                    interpret: bool = False, track_pos: bool = True):
    """windows [B, W] int32 (B multiple of bt), peq [4, N] uint32 (N multiple
    of nt), nvalid [1] int32 -> out [4, B] int32 rows:
    best_ed, best_idx, second_ed, best_end_pos (-1 unless track_pos —
    the fused scan path never consumes end positions; skipping the
    tracking drops 2 of the 18 inner-loop ops)."""
    B, W = windows.shape
    return _bc_sweep_tm(windows.T, peq, nvalid, m, bt=bt, nt=nt,
                        interpret=interpret, track_pos=track_pos)


@functools.partial(jax.jit, static_argnames=("m", "bt", "nt", "interpret",
                                             "track_pos"))
def _bc_sweep_tm(windows_tm: jax.Array, peq: jax.Array, nvalid: jax.Array,
                 m: int, bt: int = 256, nt: int = 512,
                 interpret: bool = False, track_pos: bool = True):
    """Text-major variant: windows_tm [W, B] (no transpose on the way in —
    the fused Pallas scan emits BC windows text-major)."""
    W, B = windows_tm.shape
    N = peq.shape[1]
    assert B % bt == 0 and N % nt == 0
    grid = (B // bt, N // nt)
    kernel = functools.partial(_bc_sweep_kernel, m=m, W=W,
                               track_pos=track_pos)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((W, bt), lambda i, j, nv: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, nt), lambda i, j, nv: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, bt), lambda i, j, nv: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((4, B), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * bt * nt * W * 18,
            bytes_accessed=B * W * 4 + N * 16 + B * 16,
            transcendentals=0,
        ),
        # the unrolled state (6 live [bt, nt] i32 registers with track_pos)
        # spills past the default 16M scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(nvalid, windows_tm, peq)


# ---------------------------------------------------------------------------
# MXU q-gram prefilter search (large used lists)
# ---------------------------------------------------------------------------
#
# The brute sweep costs O(B * N * W) VPU work. For large N the TPU-native
# answer is to put the candidate generation on the MXU: by the q-gram lemma
# (Ukkonen), ED(pattern, s) <= k implies pattern and s share at least
# (m - q + 1) - q*k  q-grams (bag semantics). With q = 4 the 256-dim 4-gram
# count vectors of the read window and of every barcode turn "shared >= T"
# into one [B, 256] x [256, N] matmul: dot(counts_w, counts_b) >= bag
# intersection, so dot < T proves ED > k (no false negatives; false
# positives are verified). Only the top-K scoring candidates per read then
# run the exact Myers verify on the VPU — the same semantics as the
# reference's ED-neighborhood enumeration with bailout radius
# (jar BCnucTwoBitPerBaseEDtester, bailoutIfFoundAfterED): results are
# exact within `radius`, and ed/ed2 beyond the radius report as not-found.
QGRAM_Q = 4


def build_qgram_table(patterns: np.ndarray) -> np.ndarray:
    """[N, m] int8 barcode codes (all < 4) -> [256, N] float32 4-gram
    counts, the MXU operand of the prefilter matmul."""
    N, m = patterns.shape
    ng = m - QGRAM_Q + 1
    out = np.zeros((256, N), np.float32)
    ids = np.zeros((N, ng), np.int32)
    for i in range(QGRAM_Q):
        ids = (ids << 2) | np.minimum(patterns[:, i:ng + i], 3).astype(np.int32)
    cols = np.broadcast_to(np.arange(N)[:, None], ids.shape)
    np.add.at(out, (ids.ravel(), cols.ravel()), 1.0)
    return out


def qgram_threshold(m: int, radius: int) -> int:
    """Minimal shared-4-gram count compatible with ED <= radius."""
    return (m - QGRAM_Q + 1) - QGRAM_Q * radius


@functools.partial(jax.jit, static_argnames=("m", "radius", "K"))
def qgram_prefilter_search(windows: jax.Array, qgram_t: jax.Array,
                           peq: jax.Array, nvalid: jax.Array, m: int,
                           radius: int, K: int = 64):
    """Candidate-pruned barcode search, exact within `radius`.

    windows [B, W] int8; qgram_t [256, N] float32 (build_qgram_table);
    peq [4, N] uint32; nvalid [1] int32.
    Returns out [5, B] int32 (best_ed, best_idx, second_ed, best_end_pos,
    overflow): best/second are BIG when no barcode lies within `radius`;
    ties pick the lowest whitelist index (matching the brute kernel).
    overflow[b] = 1 when more than K candidates passed the q-gram
    threshold — caller must re-run those reads through the exact sweep.
    """
    B, W = windows.shape
    N = qgram_t.shape[1]
    T = float(qgram_threshold(m, radius))
    w = windows.astype(jnp.int32)
    ng = W - QGRAM_Q + 1
    ids = jnp.zeros((B, ng), jnp.int32)
    ok = jnp.ones((B, ng), bool)
    for i in range(QGRAM_Q):
        c = w[:, i:ng + i]
        ok &= c < 4
        ids = (ids << 2) | jnp.minimum(c, 3)
    onehot = (ids[:, :, None] == jnp.arange(256, dtype=jnp.int32)[None, None, :])
    counts = jnp.sum(jnp.where(ok[:, :, None], onehot, False),
                     axis=1).astype(jnp.bfloat16)
    scores = jnp.dot(counts, qgram_t.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # [B, N]
    lane = jnp.arange(N, dtype=jnp.int32)[None, :] < nvalid[0]
    scores = jnp.where(lane, scores, -1.0)
    overflow = (jnp.sum(scores >= T, axis=1) > K).astype(jnp.int32)
    top_s, top_i = jax.lax.top_k(scores, K)          # [B, K]
    cand_ok = top_s >= T

    # exact Myers verify on the K candidates (per-read pattern set)
    peq_c = jnp.stack([peq[c][top_i] for c in range(4)], axis=0)  # [4, B, K]
    hibit = jnp.uint32(m - 1)
    full = jnp.uint32((1 << m) - 1) if m < 32 else jnp.uint32(0xFFFFFFFF)

    def step(carry, inp):
        PV, MV, score, best, best_pos = carry
        wc, t = inp
        z = jnp.uint32(0)
        eq = jnp.where((wc == 0)[:, None], peq_c[0],
              jnp.where((wc == 1)[:, None], peq_c[1],
               jnp.where((wc == 2)[:, None], peq_c[2],
                jnp.where((wc == 3)[:, None], peq_c[3], z))))
        PV, MV, score = editdist._hyyro_step(PV, MV, score, eq, hibit, 0)
        improved = score < best
        best = jnp.where(improved, score, best)
        best_pos = jnp.where(improved, t, best_pos)
        return (PV, MV, score, best, best_pos), None

    PV0 = jnp.full((B, K), full, jnp.uint32)
    MV0 = jnp.zeros((B, K), jnp.uint32)
    s0 = jnp.full((B, K), m, jnp.int32)
    bp0 = jnp.full((B, K), -1, jnp.int32)
    (_, _, _, ed, pos), _ = jax.lax.scan(
        step, (PV0, MV0, s0, s0, bp0),
        (windows.T.astype(jnp.int8), jnp.arange(W, dtype=jnp.int32)))

    inrad = cand_ok & (ed <= radius)
    ed = jnp.where(inrad, ed, BIG)
    gidx = jnp.where(inrad, top_i, BIG)
    b1 = jnp.min(ed, axis=1)
    i1 = jnp.min(jnp.where(ed == b1[:, None], gidx, BIG), axis=1)
    b2 = jnp.min(jnp.where(gidx == i1[:, None], BIG, ed), axis=1)
    p1 = jnp.max(jnp.where(gidx == i1[:, None], pos, -1), axis=1)
    return jnp.stack([b1, jnp.minimum(i1, BIG), b2, p1, overflow], axis=0)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def bc_search(windows: np.ndarray, patterns_peq: np.ndarray, n_patterns: int,
              m: int, use_pallas: bool | None = None):
    """Host wrapper: pad shapes, dispatch Pallas on TPU / jnp elsewhere.

    Args:
      windows: [B, W] int8 base codes (the BC search window per read).
      patterns_peq: [4, N] uint32 from editdist.build_peq (N may be unpadded).
      n_patterns: number of valid patterns (<= N).
      m: pattern length.
    Returns:
      dict of numpy arrays (len B): ed, idx, ed2, end_pos.
      idx/end_pos are valid only where ed < m; ed2 == editdist.INT_MAX when
      no second candidate exists (mirrors the reference's ed_sec=INTMAX).
    """
    B, W = windows.shape
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        bt, nt = 256, 512
        # power-of-two batch bucket: bounds the number of compiled shapes
        Bp = bt
        while Bp < B:
            Bp *= 2
        Np = _round_up(max(n_patterns, 1), nt)
        wins = np.full((Bp, W), 5, dtype=np.int32)  # PAD
        wins[:B] = windows
        peq = np.zeros((4, Np), dtype=np.uint32)
        peq[:, :patterns_peq.shape[1]] = patterns_peq
        out = np.asarray(bc_sweep_pallas(
            jnp.asarray(wins), jnp.asarray(peq),
            jnp.asarray([n_patterns], dtype=jnp.int32), m, bt=bt, nt=nt))
        ed, idx, ed2, pos = out[0, :B], out[1, :B], out[2, :B], out[3, :B]
    else:
        ed_all, pos_all = editdist.myers_sweep(
            jnp.asarray(windows), jnp.asarray(patterns_peq[:, :n_patterns]), m)
        ed_np, idx_np, ed2_np, _ = editdist.best_two(np.asarray(ed_all))
        ed, idx, ed2 = np.asarray(ed_np), np.asarray(idx_np), np.asarray(ed2_np)
        pos = np.asarray(pos_all)[np.arange(B), idx]
    ed2 = np.where(ed2 >= int(BIG), editdist.INT_MAX, ed2).astype(np.int64)
    return {"ed": np.asarray(ed, dtype=np.int64),
            "idx": np.asarray(idx, dtype=np.int64),
            "ed2": ed2,
            "end_pos": np.asarray(pos, dtype=np.int64)}
