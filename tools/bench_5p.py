"""5p-chemistry scan throughput on hardware (VERDICT r4 item 6).

The Pallas edge kernel serves 3p (`edgescan_tpu._supported`); 5p runs
the jnp two-half body. This measures what that costs: 3p (kernel) vs 5p
(jnp) fused scan+search throughput on the same batch geometry, content
varied per dispatch, median of N.

Run: PYTHONPATH=/root/.axon_site:. python tools/bench_5p.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def run(chem: str, samples: int = 3, B: int = 32768):
    from sicelore_tpu.models import readscan
    from sicelore_tpu.utils import dna, synth
    from sicelore_tpu.utils.config import PipelineConfig

    rng = np.random.default_rng(0)
    n_bc = 8192
    wl = synth.make_whitelist(rng, n_bc)
    mk = synth.make_read if chem == "3p" else synth.make_read_5p
    base = [mk(rng, wl[int(rng.integers(0, n_bc))],
               cdna_len=int(rng.integers(300, 700)), error_rate=0.04,
               reverse=bool(i % 2)) for i in range(B)]
    pats, _ = dna.encode_batch([w.encode() for w in wl], 16)
    model = readscan.ReadScanModel(PipelineConfig(chemistry=chem))
    model.prepare_search(pats, n_bc, radius=2)
    seqs = [r["seq"] for r in base]
    quals = [r["qual"] for r in base]
    out, res = model.finish_search(model.scan_search_async(seqs, quals))
    assert float(np.mean(out["stranded"])) > 0.9, chem
    assert float(np.mean(res["ed"] <= 2)) > 0.8, chem
    rates = []
    for s in range(samples):
        mut = []
        for q in seqs:
            p = int(rng.integers(0, len(q)))
            mut.append(q[:p] + b"ACGT"[rng.integers(0, 4):][:1] + q[p + 1:])
        t0 = time.time()
        model.finish_search(model.scan_search_async(mut, quals))
        rates.append(B / (time.time() - t0))
        print(f"  {chem} sample {s}: {rates[-1]:.0f} reads/s", flush=True)
    return float(np.median(rates))


def main():
    import bench
    bench._setup_cache()
    r3 = run("3p")
    r5 = run("5p")
    print(f"3p (Pallas kernel): {r3:.0f} reads/s")
    print(f"5p (jnp body):      {r5:.0f} reads/s ({r5 / r3:.2f}x of 3p)")


if __name__ == "__main__":
    main()
