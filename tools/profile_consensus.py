"""Memoization-safe stage profile of the batched consensus engine.

VERDICT r4 item 1(a): prove the per-2000-molecule floor with content that
VARIES per timed call (the axon tunnel memoizes identical executions,
NOTES_ROUND5.md:24-26). Stages timed per call, medians over N sets:

  build   host bucket packing (python loops + dna.encode)
  h2d     jnp.asarray of every input tensor + block_until_ready
  device  fused align+assemble dispatch + block_until_ready
  d2h     np.asarray of the merged output
  host    decode + short-circuit molecules

Also probes raw tunnel h2d/d2h bandwidth so upload-bound calls are
visible as such. Run: python tools/profile_consensus.py [N_SETS] [M]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def make_sets(n_sets: int, M: int):
    from sicelore_tpu.utils import synth
    sets = []
    for s in range(n_sets):
        rng = np.random.default_rng(100 + s)
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
    import jax
    import jax.numpy as jnp
    sz = 8 * 1024 * 1024
    a = np.random.default_rng(0).integers(0, 255, sz, np.uint8)
    t0 = time.time()
    d = jnp.asarray(a)
    d.block_until_ready()
    h2d = sz / (time.time() - t0) / 1e6
    t0 = time.time()
    np.asarray(d)
    d2h = sz / (time.time() - t0) / 1e6
    return h2d, d2h


def profile(n_sets: int = 5, M: int = 2000):
    import jax.numpy as jnp

    from sicelore_tpu.ops import poa
    from sicelore_tpu.ops import poa_tpu as pt
    from sicelore_tpu.utils import dna

    sets = make_sets(n_sets + 1, M)
    eng = pt.BatchedConsensusEngine()
    # warm with set 0 (different content from every timed set)
    t0 = time.time()
    eng(sets[0])
    print(f"warm (compile+first): {time.time() - t0:.1f}s", flush=True)

    h2d_bw, d2h_bw = tunnel_bw()
    print(f"tunnel: h2d {h2d_bw:.1f} MB/s  d2h {d2h_bw:.1f} MB/s", flush=True)

    stats = {k: [] for k in ("total", "build", "h2d", "device", "d2h",
                             "host", "h2d_bytes", "d2h_bytes")}
    for molecules in sets[1:]:
        t_all0 = time.time()
        results = [None] * len(molecules)
        from collections import defaultdict
        buckets = defaultdict(list)
        t0 = time.time()
        for mi, seqs in enumerate(molecules):
            if len(seqs) <= 2:
                results[mi] = poa.consensus_reads(seqs, 3, 20)
            else:
                c = max(len(s) for s in seqs)
                buckets[max(256, 1 << (c - 1).bit_length())].append(mi)
        t_host_short = time.time() - t0

        t_build = t_h2d = t_dev = t_d2h = 0.0
        by_h2d = by_d2h = 0
        pending = []
        for Lc, idxs in buckets.items():
            W = pt.w_for(Lc)
            PADL = pt.padl_for(W)
            t0 = time.time()
            built = eng._build_bucket(molecules, idxs, Lc, W, None)
            info, centers, clens, reads, rlens, mol_ids = built
            P = len(centers)
            Pp = max(pt.pp_step(Lc),
                     1 << (max(P, len(info) + 1) - 1).bit_length())
            Lr = Lc + W
            Lrp = ((PADL + Lr + 127) // 128) * 128
            cT = np.full((Lc, Pp), dna.PAD, np.int8)
            rT = np.full((Lrp, Pp), dna.PAD, np.int8)
            cl = np.zeros(Pp, np.int32)
            rl = np.zeros(Pp, np.int32)
            mids = np.full(Pp, len(info), np.int32)
            cmol = np.full((Pp, Lc), dna.PAD, np.int8)
            clm = np.zeros(Pp, np.int32)
            for m_local, (mi, cseq, R) in enumerate(info):
                cmol[m_local, :len(cseq)] = dna.encode(cseq)
                clm[m_local] = len(cseq)
            for p in range(P):
                cT[:clens[p], p] = dna.encode(centers[p])
                rT[PADL:PADL + rlens[p], p] = dna.encode(reads[p])
                cl[p], rl[p], mids[p] = clens[p], rlens[p], mol_ids[p]
            t_build += time.time() - t0

            t0 = time.time()
            dev = [jnp.asarray(x) for x in (cT, cl, rT, rl, mids, cmol, clm)]
            for d in dev:
                d.block_until_ready()
            t_h2d += time.time() - t0
            by_h2d += sum(x.nbytes for x in (cT, cl, rT, rl, mids, cmol, clm))

            out_cols = Lc + Lc // 8 + 16
            n = len(info)
            n2 = max(8, 1 << (n - 1).bit_length())
            fused = eng._bucket_fn(Lc, Pp, n2, 20, out_cols)
            t0 = time.time()
            merged = fused(*dev)
            merged.block_until_ready()
            t_dev += time.time() - t0
            pending.append((info, merged, out_cols, Lc, Pp, n2))

        for info, merged, out_cols, Lc, Pp, n2 in pending:
            t0 = time.time()
            arr = np.asarray(merged)
            t_d2h += time.time() - t0
            by_d2h += arr.nbytes

        stats["total"].append(time.time() - t_all0)
        stats["build"].append(t_build)
        stats["h2d"].append(t_h2d)
        stats["device"].append(t_dev)
        stats["d2h"].append(t_d2h)
        stats["host"].append(t_host_short)
        stats["h2d_bytes"].append(by_h2d)
        stats["d2h_bytes"].append(by_d2h)
        print(f"  set: total {stats['total'][-1]:.2f}s  build {t_build:.2f} "
              f"h2d {t_h2d:.2f} ({by_h2d / 1e6:.1f} MB) dev {t_dev:.2f} "
              f"d2h {t_d2h:.2f} ({by_d2h / 1e6:.1f} MB) "
              f"short {t_host_short:.2f}", flush=True)

    med = {k: float(np.median(v)) for k, v in stats.items()}
    print("\nmedians:")
    for k in ("total", "build", "h2d", "device", "d2h", "host"):
        print(f"  {k:7s} {med[k]:.3f}s")
    print(f"  h2d bytes {med['h2d_bytes'] / 1e6:.1f} MB  "
          f"implied bw {med['h2d_bytes'] / 1e6 / max(med['h2d'], 1e-9):.1f} "
          f"MB/s (probe said {h2d_bw:.1f})")
    print(f"  UMIs/s at median total: {M / med['total']:.0f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    profile(n, m)
