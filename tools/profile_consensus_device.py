"""Split the v2 consensus fused executable's device time by stage.

Times, with content varied per call and forced completion (1-element d2h
— block_until_ready does NOT block on the axon platform):
  align      unpack + prep + Pallas band kernel + record extract
  prep       unpack + band build only
  assemble   votes_assemble (segment sums + argmax + sort compaction)
  fused      align + assemble in one executable
Run: PYTHONPATH=/root/.axon_site:. python tools/profile_consensus_device.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sicelore_tpu.ops import poa_tpu as pt


def force(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf.ravel()[:1])


def build_inputs(seed: int, Lc: int, Pp: int, M2: int):
    """v2 upload tensors: 2-bit packed reads (text-major), per-molecule
    centers, sorted mids."""
    rng = np.random.default_rng(seed)
    W = pt.w_for(Lc)
    PADL = pt.padl_for(W)
    Lrp = ((PADL + Lc + W + 127) // 128) * 128
    n = M2 - 1
    rT = np.full((Lrp, Pp), 3, np.int8)
    rl = np.zeros(Pp, np.int32)
    mids = np.full(Pp, n, np.int32)
    cmol = np.zeros((M2, Lc), np.int8)
    clm = np.zeros(M2, np.int32)
    per_mol = max(1, Pp // n)
    cs = {}
    for m in range(n):
        L = int(rng.integers(Lc // 2, Lc))
        cs[m] = rng.integers(0, 4, L).astype(np.int8)
        cmol[m, :L] = cs[m]
        clm[m] = L
    for p in range(Pp):
        m = min(p // per_mol, n - 1)
        s = cs[m]
        r = s.copy()
        flip = rng.random(len(s)) < 0.03
        r[flip] = rng.integers(0, 4, int(flip.sum()))
        rT[PADL:PADL + len(r), p] = r
        rl[p], mids[p] = len(r), m
    return (pt.pack2bit_cols_np(rT), rl, mids,
            pt.pack2bit_rows_np(cmol), clm)


def timeit(name, fn, args_list, n=3):
    out = fn(*args_list[0])
    force(out)
    ts = []
    for i in range(1, n + 1):
        a = args_list[min(i, len(args_list) - 1)]
        jax.block_until_ready(a)
        t0 = time.time()
        out = fn(*a)
        force(out)
        ts.append(round(time.time() - t0, 4))
    print(f"{name:10s} {ts}", flush=True)
    return out


def main():
    import bench
    bench._setup_cache()
    Lc, Pp, M2 = 1024, 4096, 1024
    maxps = 20
    out_cols = Lc + Lc // 8 + 16

    sets = []
    for i in range(4):
        arrs = build_inputs(i, Lc, Pp, M2)
        dev = tuple(jnp.asarray(x) for x in arrs)
        jax.block_until_ready(dev)
        sets.append(dev)

    align = jax.jit(functools.partial(pt.band_align_pallas, Lc=Lc))
    timeit("align", align, sets)

    @jax.jit
    def prep_only(reads2b, rl, mids, cmol2b, clm):
        reads_tm = pt.unpack2bit_cols(reads2b)
        reads_p = jnp.transpose(reads_tm)
        cmol = pt.unpack2bit_rows(cmol2b)
        cent_p = jnp.take(cmol, mids, axis=0)
        clens = jnp.take(clm, mids)
        subs, lens = pt._prep_bands(cent_p, clens, reads_p, rl, Lc)
        return subs.sum()

    timeit("prep", prep_only, sets)

    aligned, ins, feas, cmol = align(*sets[0])
    asm = jax.jit(functools.partial(
        pt.votes_assemble, M=M2, maxps=maxps, out_cols=out_cols))
    timeit("assemble", asm,
           [(aligned + (i % 2), ins, feas, sets[0][2], cmol, sets[0][4])
            for i in range(4)])

    @jax.jit
    def fused(reads2b, rl, mids, cmol2b, clm):
        al, iv, fe, cm = pt.band_align_pallas(reads2b, rl, mids, cmol2b,
                                              clm, Lc)
        return pt.votes_assemble(al, iv, fe, mids, cm, clm, M2, maxps,
                                 out_cols)[0]

    timeit("fused", fused, sets)


def split2():
    import bench
    bench._setup_cache()
    Lc, Pp, M2 = 1024, 4096, 1024
    W = pt.w_for(Lc)
    sets = []
    for i in range(4):
        arrs = build_inputs(i, Lc, Pp, M2)
        dev = tuple(jnp.asarray(x) for x in arrs)
        jax.block_until_ready(dev)
        sets.append(dev)

    import functools as ft
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def kernel_only(reads2b, rl, mids, cmol2b, clm):
        reads_tm = pt.unpack2bit_cols(reads2b)
        reads_p = jnp.transpose(reads_tm)
        cmol = pt.unpack2bit_rows(cmol2b)
        cent_p = jnp.take(cmol, mids, axis=0)
        clens = jnp.take(clm, mids)
        subs, lens = pt._prep_bands(cent_p, clens, reads_p, rl, Lc)
        kernel = ft.partial(pt._band_align_kernel, Lc=Lc, W=W)
        R = Lc // W

        def one_block(args):
            sb, ln = args
            return pl.pallas_call(
                kernel, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_shape=[
                    jax.ShapeDtypeStruct((R, pt.g_for(Lc), 128), jnp.int32),
                    jax.ShapeDtypeStruct((2, pt.g_for(Lc), 128), jnp.int32)],
                scratch_shapes=[
                    pltpu.VMEM((Lc + 1, pt.g_for(Lc), 128), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(sb, ln)
        tb4, feas4 = jax.lax.map(one_block, (subs, lens))
        return tb4[0, 0, 0, :2], feas4[0, 0, 0, :2]

    timeit("kernel", kernel_only, sets)

    # extract alone, from on-device records
    al = jax.jit(ft.partial(pt.band_align_pallas, Lc=Lc))
    aligned, ins, feas, cmol = al(*sets[0])

    reads_p0 = jnp.transpose(pt.unpack2bit_cols(sets[0][0]))
    tb_fake = (aligned.astype(jnp.int32) << 15) | (1 << 14) | (3 << 6) | 1
    ext = jax.jit(ft.partial(pt.extract_alignments, Lc=Lc, W=W))
    timeit("extract", ext, [(tb_fake + (i % 2), reads_p0)
                            for i in range(4)])


if __name__ == "__main__":
    if "--split2" in __import__("sys").argv:
        split2()
    else:
        main()
