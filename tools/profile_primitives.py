"""Microbench the primitives the consensus rework depends on (forced
completion via 1-element d2h; content varies per call)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def force(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(name, fn, args_list):
    out = fn(*args_list[0])
    force(out)
    ts = []
    for a in args_list[1:]:
        jax.block_until_ready(a)
        t0 = time.time()
        out = fn(*a)
        force(out)
        ts.append(round(time.time() - t0, 4))
    print(f"{name:28s} {ts}", flush=True)


def main():
    rng = np.random.default_rng(0)
    M, S, out_cols = 1024, 5125, 1168
    P, Lc1, W, Lrp = 4096, 1025, 64, 1216

    # (a) per-row sort-based compaction: pack (key<<8|val), sort, slice
    @jax.jit
    def sort_compact(keep, out_idx, val):
        key = jnp.where(keep, out_idx, S + 1)
        packed = (key << 8) | val.astype(jnp.int32)
        srt = jax.lax.sort(packed, dimension=1)
        sl = srt[:, :out_cols]
        ok = (sl >> 8) <= S
        return jnp.where(ok, sl & 0xFF, 0).astype(jnp.uint8)

    sets = []
    for i in range(4):
        keep = rng.random((M, S)) < 0.85
        oi = np.cumsum(keep, axis=1) - 1
        val = rng.integers(0, 255, (M, S), np.int32)
        sets.append((jnp.asarray(keep), jnp.asarray(oi.astype(np.int32)),
                     jnp.asarray(val)))
    timeit("sort_compact [1024,5125]", sort_compact, sets)

    # (b) W-shift insertion-vote accumulation
    @jax.jit
    def ins_votes_shift(reads_p, be, bstop, active):
        K = 4
        votes = [[jnp.zeros((P, Lc1), jnp.int8) for _ in range(4)]
                 for _ in range(K)]
        for b in range(W):
            rc = reads_p[:, b:b + Lc1]
            for c in range(4):
                eq = (rc == c)
                for o in range(K - 1):
                    hit = eq & (be - o == b) & active & (bstop < b)
                    votes[o][c] = votes[o][c] + hit.astype(jnp.int8)
                pile = eq & (bstop < b) & (b <= be - (K - 1)) & active
                votes[K - 1][c] = votes[K - 1][c] + pile.astype(jnp.int8)
        return jnp.stack([jnp.stack(v, axis=-1) for v in votes], axis=2)

    sets = []
    for i in range(4):
        reads_p = rng.integers(0, 4, (P, Lrp), np.int8)
        be = rng.integers(0, W, (P, Lc1), np.int32)
        bstop = np.maximum(be - rng.integers(0, 3, (P, Lc1)), 0)
        active = rng.random((P, Lc1)) < 0.9
        sets.append(tuple(jnp.asarray(x) for x in
                          (reads_p, be, bstop.astype(np.int32), active)))
    timeit("ins_votes Wshift [4096,1025]", ins_votes_shift, sets)

    # (c) row gather centers by mids + 2-bit unpack + transpose
    M2, Lc = 1024, 1024

    @jax.jit
    def build_cT(cmol2b, mids):
        rows = jnp.take(cmol2b, mids, axis=0)          # [P, Lc/4] u8
        parts = [((rows >> s) & jnp.uint8(3)).astype(jnp.int8)
                 for s in (0, 2, 4, 6)]
        full = jnp.stack(parts, axis=-1).reshape(P, Lc)
        return jnp.transpose(full)

    sets = []
    for i in range(4):
        cm = rng.integers(0, 255, (M2, Lc // 4), np.uint8)
        mids = np.sort(rng.integers(0, M2, P)).astype(np.int32)
        sets.append((jnp.asarray(cm), jnp.asarray(mids)))
    timeit("cmol gather+unpack+T", build_cT, sets)

    # (d) 2-bit unpack of text-major reads [Lrp/4, P]
    @jax.jit
    def unpack_reads(r2b):
        parts = [((r2b >> s) & jnp.uint8(3)).astype(jnp.int8)
                 for s in (0, 2, 4, 6)]
        E = r2b.shape[0]
        return jnp.stack(parts, axis=1).reshape(E * 4, P)

    sets = []
    for i in range(4):
        r = rng.integers(0, 255, (Lrp // 4, P), np.uint8)
        sets.append((jnp.asarray(r),))
    timeit("reads 2bit unpack TM", unpack_reads, sets)


if __name__ == "__main__":
    main()
