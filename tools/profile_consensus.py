"""Memoization-safe engine-level consensus benchmark.

VERDICT r4 item 1(a)/4: content VARIES per timed call (the axon tunnel
memoizes identical executions, NOTES_ROUND5.md:24-26) and every call is
timed to actual completion (results decoded on host). Reports per-set
totals and the median UMIs/s, with tunnel health probes.

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_consensus.py [N] [M]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def make_sets(n_sets: int, M: int, seed0: int = 100):
    from sicelore_tpu.utils import synth
    sets = []
    for s in range(n_sets):
        rng = np.random.default_rng(seed0 + s)
        molecules = []
        for i in range(M):
            u = rng.random()
            n_reads = (1 if u < 0.5 else
                       2 if u < 0.7 else int(rng.integers(3, 13)))
            true = synth.random_seq(rng, int(rng.integers(400, 900)))
            molecules.append([synth.mutate(rng, true, 0.03).encode()
                              for _ in range(n_reads)])
        sets.append(molecules)
    return sets


def tunnel_bw():
    import jax.numpy as jnp
    sz = 8 * 1024 * 1024
    a = np.random.default_rng(0).integers(0, 255, sz, np.uint8)
    t0 = time.time()
    d = jnp.asarray(a)
    np.asarray(d[:1])
    h2d = sz / (time.time() - t0) / 1e6
    t0 = time.time()
    np.asarray(d)
    d2h = sz / (time.time() - t0) / 1e6
    return h2d, d2h


def profile(n_sets: int = 5, M: int = 2000):
    import bench
    bench._setup_cache()   # persistent compile cache: new bucket shapes
    # otherwise pay a 25-65 s remote compile on first sight
    from sicelore_tpu.ops.poa_tpu import BatchedConsensusEngine

    sets = make_sets(n_sets + 1, M)
    eng = BatchedConsensusEngine()
    t0 = time.time()
    eng(sets[0])   # warm (different content from every timed set)
    print(f"warm (compile+first): {time.time() - t0:.1f}s", flush=True)

    h2d_bw, d2h_bw = tunnel_bw()
    print(f"tunnel: h2d {h2d_bw:.1f} MB/s  d2h {d2h_bw:.1f} MB/s",
          flush=True)

    totals = []
    for molecules in sets[1:]:
        t0 = time.time()
        res = eng(molecules)
        dt = time.time() - t0
        assert len(res) == M and all(r[0] for r in res)
        totals.append(dt)
        print(f"  set: {dt:.3f}s  ({M / dt:.0f} UMIs/s)", flush=True)
    med = float(np.median(totals))
    print(f"\nmedian total {med:.3f}s -> {M / med:.0f} UMIs/s "
          f"({M / med / 167.0:.1f}x the 20-core spoa baseline)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    profile(n, m)
