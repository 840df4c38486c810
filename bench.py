"""Headline benchmarks on one chip.

1. scanfastq device path (headline): fused edge scan (stranding + polyA/
   adapter/TSO geometry) + used-list barcode search — reference Step 1,
   baseline ~20.8k reads/s on a 96-core Promethion tower
   (/root/reference/README.md:106; BASELINE.md). Measured at BOTH an 8k
   and a 49k used-barcode list (VERDICT r4 item 4: the sweep is linear in
   list size; real PromethION runs carry tens of thousands).
2. consensus: batched banded-DP POA engine (spoa replacement) on a
   WTA-shaped molecule mix — baseline ~167 UMIs/s on 20 cores
   (/root/reference/README.md:1146-1147).
3. honest end-to-end: fastq dir in -> passed/ fastq out (pass 1 + chimera
   scan + pass 2 + read-name metadata + writes) on >= 100k reads.

Methodology (VERDICT r4 item 4): every timed dispatch carries content not
dispatched before in this process — the remote tunnel MEMOIZES identical
executions (NOTES_ROUND5.md), so repeated-content timing measures a
cache. Throughputs are the MEDIAN of >= 5 samples, each tagged with a
tunnel-health probe (per-dispatch latency + d2h bandwidth); congested
samples are visible as such instead of silently averaged.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_READS_PER_S = 20_800.0  # 100M reads / 80 min, 96 cores
BASELINE_UMIS_PER_S = 167.0      # 600k UMIs/hour, 20 threads + spoa

# Speed-of-light anchors for utilization reporting (TPU v5e, one core):
# the hot kernels are integer/VPU-bound (Myers bit-parallel, banded DP),
# so the roofline is VPU issue rate, not MXU FLOPs. 8x128 lanes/cycle at
# ~0.94 GHz ~= 9.6e11 lane-ops/s.
VPU_LANE_OPS_PER_S = 9.6e11
HBM_BYTES_PER_S = 8.1e11


def _setup_cache():
    import jax
    try:  # persistent compile cache: first run pays, later runs are instant
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # MUST be 0 on the remote-compile (axon) platform: jax only
        # measures its local dispatch of the compile RPC (<1s) while the
        # service spends minutes, so any threshold suppresses every write
        # and the persistent cache never hits (measured: the whole cold
        # wall re-pays on every process start)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass


def tunnel_health():
    """(median per-dispatch round-trip ms, d2h MB/s) of trivial device
    ops. The remote-TPU tunnel's latency and bandwidth swing 3-10x
    between windows minutes apart; every sample below carries this probe
    so a congested sample is visible as such."""
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.int32)
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(f(x)[:1, :1])
        ts.append(time.time() - t0)
    lat = sorted(ts)[len(ts) // 2] * 1e3
    big = jax.jit(lambda a: a + 1)(jnp.zeros(2 * 1024 * 1024, jnp.uint8))
    big.block_until_ready()
    t0 = time.time()
    np.asarray(big)
    bw = 2.0 / max(time.time() - t0, 1e-6)
    return round(lat, 2), round(bw, 1)


def _make_reads(rng, wl, n, error_rate=0.05, unique=True):
    """n UNIQUE reads (VERDICT r3 item 9: the headline previously tiled
    2,048 reads to 32k): length-skewed cDNA (300-700 nt bulk, ~3% long
    2-6 kb) plus ~2% random garbage."""
    from sicelore_tpu.utils import synth
    m = n if unique else min(n, 2048)
    base = []
    for i in range(m):
        u = i % 64
        if u == 13:
            clen = int(rng.integers(2000, 6000))
        elif u == 37:
            L = int(rng.integers(60, 900))
            s = synth.random_seq(rng, L).encode()
            base.append({"seq": s, "qual": bytes(
                [33 + int(x) for x in rng.integers(2, 30, L)])})
            continue
        else:
            clen = int(rng.integers(300, 700))
        base.append(synth.make_read(rng, wl[int(rng.integers(0, len(wl)))],
                                    cdna_len=clen, error_rate=error_rate,
                                    reverse=bool(i % 2)))
    seqs = [base[i % len(base)]["seq"] for i in range(n)]
    quals = [base[i % len(base)]["qual"] for i in range(n)]
    return seqs, quals


_ACGT4 = (b"A", b"C", b"G", b"T")


def _mutate_batch(rng, seqs):
    """One substituted base per read: distinct content for every timed
    dispatch (the tunnel memoizes identical executions) at ~zero cost to
    the workload's statistics."""
    out = []
    for s in seqs:
        p = int(rng.integers(0, len(s)))
        out.append(s[:p] + _ACGT4[int(rng.integers(0, 4))] + s[p + 1:])
    return out


def bench_scan(n_bc=8192, samples=5, dispatches=2, mode=None,
               verbose=False):
    """Pass-2 hot path: 2-bit mega-batch upload -> fused edge scan +
    used-list barcode search -> packed int16 download, depth-2 pipelined.

    Returns (median reads/s, per-sample [(rps, lat_ms, d2h_mbps)], vpu
    util). Content varies per dispatch; median of `samples`."""
    from collections import deque

    from sicelore_tpu.models import readscan
    from sicelore_tpu.utils import dna, synth

    rng = np.random.default_rng(0)
    B = 32768
    wl = synth.make_whitelist(rng, n_bc)
    seqs, quals = _make_reads(rng, wl, B)
    pats, _ = dna.encode_batch([w.encode() for w in wl], 16)

    model = readscan.ReadScanModel()
    model.prepare_search(pats, n_bc, radius=2, mode=mode)

    t0 = time.time()
    h = model.scan_search_async(seqs, quals)
    out, res = model.finish_search(h)
    if verbose:
        import sys
        print(f"scan[{n_bc}] compile+first: {time.time() - t0:.1f}s "
              f"(mode={model._mode})", file=sys.stderr)
    assert float(np.mean(out["stranded"])) > 0.9
    assert float(np.mean(res["ed"] <= 2)) > 0.8

    per_sample = []
    for s in range(samples):
        variants = [( _mutate_batch(rng, seqs), quals)
                    for _ in range(dispatches)]
        lat, bw = tunnel_health()
        q = deque()
        t0 = time.time()
        for sq, qu in variants:
            q.append(model.scan_search_async(sq, qu))
            if len(q) > 2:
                model.finish_search(q.popleft())
        while q:
            model.finish_search(q.popleft())
        dt = time.time() - t0
        rps = dispatches * B / dt
        per_sample.append((round(rps, 1), lat, bw))
        if verbose:
            import sys
            print(f"scan[{n_bc}] sample {s}: {rps:.0f} reads/s "
                  f"(lat {lat} ms, d2h {bw} MB/s)", file=sys.stderr)
    med = float(np.median([p[0] for p in per_sample]))
    # utilization vs the VPU roofline: the dominant term is the Myers
    # barcode sweep, ~18 lane-ops per (read, barcode, window char)
    sweep_ops = B * n_bc * model.bc_window_width * 18
    util = sweep_ops / (B / med) / VPU_LANE_OPS_PER_S
    return med, per_sample, util


def bench_consensus(samples=5, M=2000, verbose=False):
    """WTA-shaped molecule mix (README.md:1146: ~50% molecules multi-read):
    50% 1-read, 20% 2-read, 30% 3..12-read molecules, 400-900 nt cDNA at
    3% error. Distinct molecule sets per timed call; median of `samples`.
    Returns (median UMIs/s, per-sample [(umis_s, lat, bw)], vpu util)."""
    from sicelore_tpu.ops.poa_tpu import BatchedConsensusEngine
    from sicelore_tpu.utils import synth

    def make_set(seed):
        rng = np.random.default_rng(seed)
        molecules = []
        for i in range(M):
            u = rng.random()
            n_reads = (1 if u < 0.5 else
                       2 if u < 0.7 else int(rng.integers(3, 13)))
            true = synth.random_seq(rng, int(rng.integers(400, 900)))
            molecules.append([synth.mutate(rng, true, 0.03).encode()
                              for _ in range(n_reads)])
        return molecules

    engine = BatchedConsensusEngine()
    t0 = time.time()
    # warm on TWO distinct sets: covers the (Pp, n2) shape grid the timed
    # sets will hit, so timed samples measure execution, not artifact
    # loads (one-time per process)
    engine(make_set(1))
    engine(make_set(2))
    if verbose:
        import sys
        print(f"consensus compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr)
    per_sample = []
    pairs_ref = None
    for s in range(samples):
        mols = make_set(100 + s)
        if pairs_ref is None:
            pairs_ref = sum(len(m) - 1 for m in mols if len(m) > 2)
        lat, bw = tunnel_health()
        t0 = time.time()
        res = engine(mols)
        dt = time.time() - t0
        assert len(res) == M and all(r[0] for r in res)
        per_sample.append((round(M / dt, 1), lat, bw))
        if verbose:
            import sys
            print(f"consensus sample {s}: {M / dt:.0f} UMIs/s "
                  f"(lat {lat} ms, d2h {bw} MB/s)", file=sys.stderr)
    med = float(np.median([p[0] for p in per_sample]))
    # banded-DP utilization: ~30 lane-ops per band cell, fwd + traceback
    cells = pairs_ref * 700 * 48 * 2        # avg center x avg band
    util = cells * 30 / (M / med) / VPU_LANE_OPS_PER_S
    return med, per_sample, util


def bench_e2e(verbose=False, n_reads=102_400, warm_runs=3,
              cold_runs=3):
    """Honest end-to-end: synthetic fastq dir -> ScanFastqPipeline.run
    (pass 1, used-list build, chimera scan, pass 2, fastq/stats writes).

    The workload is deliberately messy (VERDICT r2 item 8): ~6% of reads
    are length-skewed long reads (2-8 kb cDNA), ~2% chimeric fusions and
    ~2% random garbage. Each timed run gets ITS OWN fastq dir with
    mutated content (no dispatch repeats content); warm = median of
    `warm_runs`. Cold = `cold_runs` CONSECUTIVE fresh subprocesses, each
    on its own dataset, against the populated persistent compile + AOT
    caches — the honest deployment cold start (VERDICT r4 item 5:
    multi-sample evidence, not one).

    Returns (warm_median_rps, per_run, [cold_rps...])."""
    import shutil
    import subprocess
    import sys as _sys
    import tempfile
    from pathlib import Path

    from sicelore_tpu.models import readscan
    from sicelore_tpu.pipeline.scanfastq import ScanFastqPipeline
    from sicelore_tpu.utils import synth as _sy
    from sicelore_tpu.utils import synth

    rng = np.random.default_rng(2)
    N_BC = 384  # cells in the library (pass 1 discovers them)
    wl_cells = synth.make_whitelist(rng, N_BC)
    # whitelist = cells + decoys (pass-1 search space)
    wl = wl_cells + synth.make_whitelist(np.random.default_rng(3), 8192)
    seqs, quals = _make_reads(rng, wl_cells, n_reads, error_rate=0.04)
    # harden the mix: long reads, chimeras, garbage (deterministic slots)
    for i in range(0, n_reads, 16):
        u = (i // 16) % 8
        if u == 0:      # length-skewed long read
            r = _sy.make_read(rng, wl_cells[i % N_BC],
                              cdna_len=int(rng.integers(2000, 8000)),
                              error_rate=0.05, reverse=bool(i % 2))
        elif u == 1 and i % 48 == 16:   # chimera
            r = _sy.make_chimera(rng, wl_cells[i % N_BC],
                                 wl_cells[(i + 7) % N_BC], cdna_len=500)
        elif u == 2 and i % 48 == 32:   # garbage
            r = {"seq": _sy.random_seq(rng,
                                       int(rng.integers(60, 900))).encode(),
                 "qual": b""}
            r["qual"] = bytes([33 + int(x) for x in
                               rng.integers(2, 30, len(r["seq"]))])
        else:
            continue
        seqs[i], quals[i] = r["seq"], r["qual"]

    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))

    def write_dir(name, sq):
        d = tmp / name
        d.mkdir()
        per_file = n_reads // 4
        k = 0
        for f in range(4):
            with open(d / f"part{f}.fastq", "wb") as fh:
                for i in range(per_file):
                    fh.write(b"@read%d\n" % k + sq[k] + b"\n+\n"
                             + quals[k] + b"\n")
                    k += 1
        return d, k

    try:
        dirs = [write_dir("fq0", seqs)]
        for v in range(1, warm_runs + cold_runs + 1):
            dirs.append(write_dir(f"fq{v}", _mutate_batch(rng, seqs)))
        model = readscan.ReadScanModel()
        # run 0 warms every executable; runs 1..warm_runs are timed, each
        # on its own mutated dataset
        per_run = []
        k = n_reads
        for run in range(warm_runs + 1):
            fq_dir, k = dirs[run], n_reads
            lat, bw = tunnel_health() if run else (0.0, 0.0)
            pipe = ScanFastqPipeline(whitelist=wl, chunk_size=32768,
                                     model=model)
            t0 = time.time()
            stats = pipe.run([fq_dir[0]], tmp / f"out{run}")
            dt = time.time() - t0
            if run:
                per_run.append((round(k / dt, 1), lat, bw))
            if verbose:
                print(f"e2e {'warmup' if run == 0 else 'run'}: "
                      f"{k / dt:.0f} reads/s ({dt:.1f}s)", file=_sys.stderr)
            assert stats.bc_assigned > 0.8 * k, stats.to_json()
        warm_med = float(np.median([p[0] for p in per_run]))
        # cold = CONSECUTIVE FRESH SUBPROCESSES, each on a
        # never-dispatched dataset
        wl_file = tmp / "wl.txt"
        wl_file.write_text("\n".join(wl))
        colds = []
        for ci in range(cold_runs):
            cold_dir = dirs[warm_runs + 1 + ci][0]
            script = (
                "import time,sys,json\n"
                "sys.path.insert(0, %r)\n"
                "import bench; bench._setup_cache()\n"
                "from sicelore_tpu.pipeline.scanfastq import "
                "ScanFastqPipeline\n"
                "t0=time.time()\n"
                "p=ScanFastqPipeline(whitelist=open(%r).read().split(),"
                "chunk_size=32768)\n"
                "s=p.run([%r], %r)\n"
                "print(json.dumps({'dt': time.time()-t0,"
                "'assigned': s.bc_assigned}))\n"
                % (str(Path(__file__).resolve().parent), str(wl_file),
                   str(cold_dir), str(tmp / f"out_cold{ci}")))
            r = subprocess.run([_sys.executable, "-c", script],
                               capture_output=True, text=True,
                               timeout=1800)
            cold_rps = 0.0
            for line in reversed(r.stdout.splitlines()):
                try:
                    d = json.loads(line)
                    cold_rps = k / d["dt"]
                    assert d["assigned"] > 0.8 * k
                    break
                except (json.JSONDecodeError, KeyError):
                    continue
            colds.append(round(cold_rps, 1))
            if verbose:
                print(f"e2e cold {ci}: {cold_rps:.0f} reads/s",
                      file=_sys.stderr)
        return warm_med, per_run, colds
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main(verbose: bool = False):
    _setup_cache()
    scan_rps, scan_samples, sweep_util = bench_scan(
        n_bc=8192, verbose=verbose)
    scan50_rps, scan50_samples, _ = bench_scan(
        n_bc=49152, samples=3, verbose=verbose)
    umis_ps, cons_samples, cons_util = bench_consensus(verbose=verbose)
    e2e_rps, e2e_runs, e2e_cold = bench_e2e(verbose)
    print(json.dumps({
        "metric": "scanfastq_reads_per_s_per_chip",
        "value": round(scan_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(scan_rps / BASELINE_READS_PER_S, 2),
        "extra": {
            "scan_samples": scan_samples,
            "scan_50k_bc_reads_per_s": round(scan50_rps, 1),
            "scan_50k_samples": scan50_samples,
            "consensus_umis_per_s": round(umis_ps, 1),
            "consensus_vs_baseline": round(umis_ps / BASELINE_UMIS_PER_S, 2),
            "consensus_samples": cons_samples,
            "e2e_scanfastq_reads_per_s": round(e2e_rps, 1),
            "e2e_vs_baseline": round(e2e_rps / BASELINE_READS_PER_S, 2),
            "e2e_samples": e2e_runs,
            "e2e_cold_incl_compiles_reads_per_s": (
                float(np.median(e2e_cold)) if e2e_cold else 0.0),
            "e2e_cold_samples": e2e_cold,
            # achieved fraction of the VPU lane-op roofline (the hot
            # kernels are integer-bound; MXU FLOPs are the wrong axis)
            "bc_sweep_vpu_util": round(sweep_util, 4),
            "consensus_dp_vpu_util": round(cons_util, 4),
        },
    }))


if __name__ == "__main__":
    import sys
    main(verbose="-v" in sys.argv)
