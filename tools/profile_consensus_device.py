"""Split the consensus fused executable's device time by stage.

Times, with content varied per call (memoization-safe):
  align    _prep_bands + Pallas band kernel + extract_alignments
  votes    votes_assemble WITHOUT the final compaction scatter
  compact  the final stream-compaction scatter-max alone
Run: PYTHONPATH=/root/.axon_site:. python tools/profile_consensus_device.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sicelore_tpu.ops import poa_tpu as pt
from sicelore_tpu.utils import dna


def build_inputs(seed: int, Lc: int, Pp: int, M: int):
    rng = np.random.default_rng(seed)
    W = pt.w_for(Lc)
    PADL = pt.padl_for(W)
    Lr = Lc + W
    Lrp = ((PADL + Lr + 127) // 128) * 128
    cT = np.full((Lc, Pp), dna.PAD, np.int8)
    rT = np.full((Lrp, Pp), dna.PAD, np.int8)
    cl = np.zeros(Pp, np.int32)
    rl = np.zeros(Pp, np.int32)
    mids = np.zeros(Pp, np.int32)
    cmol = np.full((Pp, Lc), dna.PAD, np.int8)
    clm = np.zeros(Pp, np.int32)
    per_mol = max(1, Pp // M)
    for p in range(Pp):
        L = int(rng.integers(Lc // 2, Lc))
        s = rng.integers(0, 4, L).astype(np.int8)
        cT[:L, p] = s
        r = s.copy()
        flip = rng.random(L) < 0.03
        r[flip] = rng.integers(0, 4, int(flip.sum()))
        rT[PADL:PADL + L, p] = r
        cl[p], rl[p] = L, L
        mids[p] = min(p // per_mol, M - 1)
    for m in range(M):
        p = min(m * per_mol, Pp - 1)
        cmol[m] = cT[:, p]
        clm[m] = cl[p]
    return cT, cl, rT, rl, mids, cmol, clm


def main():
    Lc, Pp, M = 1024, 4096, 1024
    maxps = 20
    out_cols = Lc + Lc // 8 + 16

    align = jax.jit(functools.partial(pt.band_align_pallas, Lc=Lc))

    @functools.partial(jax.jit, static_argnames=())
    def votes_nocompact(aligned, ins, feasible, mids, cmol, clm):
        P, Lc1 = aligned.shape
        L = Lc1 - 1
        ch5 = jnp.arange(5, dtype=jnp.int32)
        cv = jax.ops.segment_sum(
            (aligned[:, :L, None] == ch5).astype(jnp.int32), mids,
            num_segments=Pp)
        iv = jax.ops.segment_sum(ins.astype(jnp.int32), mids,
                                 num_segments=Pp)
        pc = jax.ops.segment_sum(feasible.astype(jnp.int32), mids,
                                 num_segments=Pp)
        return cv.sum(), iv.sum(), pc.sum()

    full = jax.jit(functools.partial(
        pt.votes_assemble, M=Pp, maxps=maxps, out_cols=out_cols))

    def timeit(name, fn, args_fn, n=3):
        out = fn(*args_fn(0))
        jax.block_until_ready(out)
        def force(o):
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(leaf.ravel()[:1])  # 4-byte d2h: forces completion
        force(out)
        ts = []
        for i in range(1, n + 1):
            a = args_fn(i)
            jax.block_until_ready(a)
            force(a[0])
            t0 = time.time()
            out = fn(*a)
            force(out)
            ts.append(time.time() - t0)
        print(f"{name:22s} median {sorted(ts)[len(ts) // 2]:.3f}s  {ts}",
              flush=True)
        return out

    ins_cache = {}

    def align_args(i):
        key = i
        if key not in ins_cache:
            cT, cl, rT, rl, mids, cmol, clm = build_inputs(i, Lc, Pp, M)
            ins_cache[key] = tuple(jnp.asarray(x) for x in
                                   (cT, cl, rT, rl, mids, cmol, clm))
        t = ins_cache[key]
        return t[0], t[1], t[2], t[3]

    aligned, ins, feas = timeit("align(prep+pallas+ext)", align, align_args)

    def votes_args(i):
        t = ins_cache[min(i, max(ins_cache))]
        return aligned, ins, feas, t[4], t[5] - i % 2, t[6]

    timeit("votes (segsum only)", votes_nocompact,
           lambda i: (aligned + i % 2, ins, feas, ins_cache[0][4],
                      ins_cache[0][5], ins_cache[0][6]))
    timeit("votes_assemble full", full,
           lambda i: (aligned + 0 * i, ins, feas + i % 2, ins_cache[0][4],
                      ins_cache[0][5], ins_cache[0][6]))

    # also: the Pallas map alone (no prep, no extract)
    subs, lens = pt._prep_bands(*align_args(0)[:4], Lc)
    jax.block_until_ready((subs, lens))
    prep = jax.jit(functools.partial(pt._prep_bands, Lc=Lc))
    timeit("prep_bands alone", prep, align_args)


if __name__ == "__main__":
    main()


def split_pallas_extract():
    import functools as ft
    Lc, Pp, M = 1024, 4096, 1024
    W = pt.w_for(Lc)
    QP = 128 // W

    @ft.partial(jax.jit)
    def pallas_only(cT, cl, rT, rl):
        subs, lens = pt._prep_bands(cT, cl, rT, rl, Lc)
        kernel = ft.partial(pt._band_align_kernel, Lc=Lc, W=W)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def one_block(args):
            sb, ln = args
            return pl.pallas_call(
                kernel, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_shape=[
                    jax.ShapeDtypeStruct((Lc + pt.ALN, pt.GRP, 128),
                                         jnp.int32),
                    jax.ShapeDtypeStruct((1, pt.GRP, 128), jnp.int32)],
                scratch_shapes=[
                    pltpu.VMEM((Lc + 1, pt.GRP, 128), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(sb, ln)
        return jax.lax.map(one_block, (subs, lens))

    @ft.partial(jax.jit)
    def reshape_extract(tb4, feas4, rT):
        tb = tb4[:, :Lc + 1, :, :QP].reshape(-1, Lc + 1, pt.pp_step(Lc))
        tb = jnp.transpose(tb, (1, 0, 2)).reshape(Lc + 1, Pp)
        feas = feas4[:, 0, :, :QP].reshape(-1, pt.pp_step(Lc)).reshape(1, Pp)
        return pt.extract_alignments(jnp.transpose(tb), feas[0],
                                     jnp.transpose(rT), Lc, W)

    sets = [build_inputs(i, Lc, Pp, M) for i in range(4)]
    dev = [tuple(jnp.asarray(x) for x in s) for s in sets]

    def force(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf.ravel()[:1])

    out = pallas_only(dev[0][0], dev[0][1], dev[0][2], dev[0][3])
    force(out)
    ts = []
    for i in range(1, 4):
        t0 = time.time()
        out = pallas_only(dev[i][0], dev[i][1], dev[i][2], dev[i][3])
        force(out)
        ts.append(round(time.time() - t0, 3))
    print(f"prep+pallas(map) only  {ts}", flush=True)

    tb4, feas4 = out
    o2 = reshape_extract(tb4, feas4, dev[0][2])
    force(o2)
    ts = []
    for i in range(1, 4):
        t0 = time.time()
        o2 = reshape_extract(tb4 + i % 2, feas4, dev[i][2])
        force(o2)
        ts.append(round(time.time() - t0, 3))
    print(f"reshape+extract only   {ts}", flush=True)


if __name__ == "__main__" and "--split" in __import__("sys").argv:
    split_pallas_extract()
