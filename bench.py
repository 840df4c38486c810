"""Headline benchmark: scanfastq device path — reads/s on one chip.

Measures the fused edge scan (stranding + polyA/adapter/TSO + BC-window
extraction) plus the Pallas whitelist ED sweep — the compute path of
reference Step 1, whose baseline is ~20.8k reads/s on a 96-core Promethion
tower (/root/reference/README.md:106; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_READS_PER_S = 20_800.0  # 100M reads / 80 min, 96 cores


def main(verbose: bool = False):
    import jax
    import jax.numpy as jnp
    try:  # persistent compile cache: first run pays, later runs are instant
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from sicelore_tpu.models import readscan
    from sicelore_tpu.ops import bcsearch, editdist
    from sicelore_tpu.utils import dna, synth
    from sicelore_tpu.utils.config import PipelineConfig

    cfg = PipelineConfig()
    rng = np.random.default_rng(0)
    B = 8192
    N_BC = 8192  # used-barcode list size (large experiment)

    wl = synth.make_whitelist(rng, N_BC)
    reads = [synth.make_read(rng, wl[int(rng.integers(0, N_BC))],
                             cdna_len=int(rng.integers(300, 700)),
                             error_rate=0.05, reverse=bool(i % 2))
             for i in range(2048)]
    # tile to B reads (encode cost dominated by device path anyway)
    seqs = [reads[i % len(reads)]["seq"] for i in range(B)]
    quals = [reads[i % len(reads)]["qual"] for i in range(B)]
    codes, qv, comp_lens, _ = readscan.encode_composite(seqs, quals)

    model = readscan.ReadScanModel(cfg)
    pats, _ = dna.encode_batch([w.encode() for w in wl], 16)
    peq = editdist.build_peq(pats)
    model.prepare_search(peq, N_BC)

    # warmup / compile (the real pipeline encodes composites per chunk; the
    # bench measures the device path + transfers, pipelined as in pass 2)
    t0 = time.time()
    h = model.scan_search_async(seqs, quals)
    out, res = model.finish_search(h)
    if verbose:
        import sys
        print(f"compile+first batch: {time.time()-t0:.1f}s", file=sys.stderr)
    assert float(np.mean(out["stranded"])) > 0.9
    assert float(np.mean(res["ed"] <= 2)) > 0.8

    iters = 12
    depth = 3  # batches in flight (hides tunnel RTT + device latency)
    t0 = time.time()
    from collections import deque
    q = deque()
    for _ in range(depth):
        q.append(model.scan_search_async(seqs, quals))
    for _ in range(iters - depth):
        q.append(model.scan_search_async(seqs, quals))
        model.finish_search(q.popleft())
    while q:
        model.finish_search(q.popleft())
    dt = (time.time() - t0) / iters
    reads_per_s = B / dt

    print(json.dumps({
        "metric": "scanfastq_reads_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 2),
    }))


if __name__ == "__main__":
    import sys
    main(verbose="-v" in sys.argv)
