"""A/B: plain jax.jit vs aotcache-wrapped dispatch of the SAME consensus
fused bucket fn, same on-device inputs, content varied per call."""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sicelore_tpu.ops import poa_tpu as pt
from sicelore_tpu.utils import aotcache
from tools.profile_consensus_device import build_inputs

Lc, Pp, M = 1024, 4096, 1024
maxps = 20
out_cols = Lc + Lc // 8 + 16
n2 = M


def fused(cT, cl, rT, rl, mids, cmol, clm):
    aligned, ins, feas = band = pt.band_align_pallas(cT, cl, rT, rl, Lc)
    packed, out_len, pc, overflow = pt.votes_assemble(
        aligned, ins, feas, mids, cmol, clm, Pp, maxps, out_cols)
    ol = out_len[:n2, None].astype(jnp.uint32)
    lb = jnp.concatenate(
        [((ol >> s) & 0xFF).astype(jnp.uint8) for s in (0, 8, 16, 24)],
        axis=1)
    ov = overflow[:n2, None].astype(jnp.uint8)
    return jnp.concatenate([packed[:n2], lb, ov], axis=1)


def timeit(name, fn, sets, n=3):
    out = fn(*sets[0])
    jax.block_until_ready(out)
    ts = []
    for i in range(1, n + 1):
        t0 = time.time()
        out = fn(*sets[i])
        np.asarray(out[:1, :1])  # force real completion (1-byte d2h)
        ts.append(round(time.time() - t0, 4))
    print(f"{name:12s} {ts}", flush=True)


def main():
    sets = []
    for i in range(4):
        arrs = build_inputs(i, Lc, Pp, M)
        dev = tuple(jnp.asarray(x) for x in arrs)
        jax.block_until_ready(dev)
        sets.append(dev)

    plain = jax.jit(fused)
    timeit("plain jit", plain, sets)

    wrapped = aotcache.wrap("abtest", "v1", fused)
    timeit("aot wrap", wrapped, sets)
    timeit("aot wrap2", wrapped, sets)


if __name__ == "__main__":
    main()
