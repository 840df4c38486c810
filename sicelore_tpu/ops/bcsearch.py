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
                     PV, MV, score, best, bestpos, *, m: int, W: int):
    j = pl.program_id(1)
    bt, nt = best.shape
    full = jnp.uint32((1 << m) - 1) if m < 32 else jnp.uint32(0xFFFFFFFF)
    hibit = jnp.uint32(m - 1)

    PV[:] = jnp.full((bt, nt), full, dtype=jnp.uint32)
    MV[:] = jnp.zeros((bt, nt), dtype=jnp.uint32)
    score[:] = jnp.full((bt, nt), m, dtype=jnp.int32)
    best[:] = jnp.full((bt, nt), m, dtype=jnp.int32)
    bestpos[:] = jnp.full((bt, nt), -1, dtype=jnp.int32)

    def body(t, _):
        # [bt, 1] int32 (reshape of a 32-bit vector is a supported no-op;
        # reshaping an i1 mask is not — compare after broadcasting)
        wc = win_ref[t, :][:, None]
        z = jnp.zeros((bt, nt), dtype=jnp.uint32)
        eq = jnp.where(wc == 0, peq_ref[0, :][None, :],
              jnp.where(wc == 1, peq_ref[1, :][None, :],
               jnp.where(wc == 2, peq_ref[2, :][None, :],
                jnp.where(wc == 3, peq_ref[3, :][None, :], z))))
        pv, mv, sc = PV[:], MV[:], score[:]
        Xv = eq | mv
        Xh = (((eq & pv) + pv) ^ pv) | eq
        Ph = mv | ~(Xh | pv)
        Mh = pv & Xh
        sc = sc + ((Ph >> hibit) & jnp.uint32(1)).astype(jnp.int32)
        sc = sc - ((Mh >> hibit) & jnp.uint32(1)).astype(jnp.int32)
        Ph = Ph << jnp.uint32(1)  # free text start (search variant)
        Mh = Mh << jnp.uint32(1)
        PV[:] = Mh | ~(Xv | Ph)
        MV[:] = Ph & Xv
        score[:] = sc
        improved = sc < best[:]
        bestpos[:] = jnp.where(improved, t, bestpos[:])
        best[:] = jnp.where(improved, sc, best[:])
        return 0

    jax.lax.fori_loop(0, W, body, 0)

    # mask barcode lanes beyond the real whitelist size
    gidx = j * nt + jax.lax.broadcasted_iota(jnp.int32, (bt, nt), 1)
    ed = jnp.where(gidx < nvalid_ref[0], best[:], BIG)

    # within-tile best / first-argmin / second-best / end position
    b1 = jnp.min(ed, axis=1)
    i1 = jnp.min(jnp.where(ed == b1[:, None], gidx, BIG), axis=1)
    b2 = jnp.min(jnp.where(gidx == i1[:, None], BIG, ed), axis=1)
    pos = jnp.max(jnp.where(gidx == i1[:, None], bestpos[:], -1), axis=1)

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


@functools.partial(jax.jit, static_argnames=("m", "bt", "nt", "interpret"))
def bc_sweep_pallas(windows: jax.Array, peq: jax.Array, nvalid: jax.Array,
                    m: int, bt: int = 256, nt: int = 512, interpret: bool = False):
    """windows [B, W] int32 (B multiple of bt), peq [4, N] uint32 (N multiple
    of nt), nvalid [1] int32 -> out [4, B] int32 rows:
    best_ed, best_idx, second_ed, best_end_pos."""
    B, W = windows.shape
    N = peq.shape[1]
    assert B % bt == 0 and N % nt == 0
    grid = (B // bt, N // nt)
    kernel = functools.partial(_bc_sweep_kernel, m=m, W=W)
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
            scratch_shapes=[
                pltpu.VMEM((bt, nt), jnp.uint32),
                pltpu.VMEM((bt, nt), jnp.uint32),
                pltpu.VMEM((bt, nt), jnp.int32),
                pltpu.VMEM((bt, nt), jnp.int32),
                pltpu.VMEM((bt, nt), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((4, B), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * bt * nt * W * 18,
            bytes_accessed=B * W * 4 + N * 16 + B * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nvalid, windows.T, peq)


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
