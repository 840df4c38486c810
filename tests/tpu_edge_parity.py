"""Real-TPU parity check: edge-scan Pallas kernel vs the jnp two-half body.

Not pytest-collected (tests/conftest.py forces a CPU mesh, and the fully
unrolled kernel cannot be interpreted on CPU in reasonable time). Run
standalone on TPU hardware:  python tests/tpu_edge_parity.py
The driver's bench (bench.py) also asserts the kernel's outputs
behaviorally on every run (stranding + assignment rates).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=4096, seed=23):
    import jax.numpy as jnp

    from sicelore_tpu.models import readscan
    from sicelore_tpu.ops import edgescan as eg
    from sicelore_tpu.ops.edgescan_tpu import make_edge_scan2_kernel
    from sicelore_tpu.utils import synth
    from sicelore_tpu.utils.config import PipelineConfig

    rng = np.random.default_rng(seed)
    cfg = PipelineConfig()
    wl = synth.make_whitelist(rng, 48)
    seqs, quals = [], []
    for i in range(B):
        u = i % 13
        if u == 5:       # garbage / unstranded
            L = int(rng.integers(20, 700))
            s = synth.random_seq(rng, L).encode()
            q = bytes([33 + int(x) for x in rng.integers(2, 40, L)])
        elif u == 7:     # very long read
            r = synth.make_read(rng, wl[i % 48],
                               cdna_len=int(rng.integers(2000, 8000)),
                               error_rate=0.06, reverse=bool(i % 2))
            s, q = r["seq"], r["qual"]
        else:
            r = synth.make_read(rng, wl[i % 48],
                               cdna_len=int(rng.integers(60, 1500)),
                               error_rate=0.06, reverse=bool(i % 2))
            s, q = r["seq"], r["qual"]
        seqs.append(s)
        quals.append(q)
    packed, qv2, lens, dirty, qsum = eg.encode_composite_tm(seqs, quals)
    model = readscan.ReadScanModel(cfg)
    jbody = eg.make_edge_scan2_packed(cfg, use_pallas=False)
    mj = np.asarray(jbody(jnp.asarray(packed), model.peq_ad, model.peq_adc,
                          model.peq_tso))
    kfn = make_edge_scan2_kernel(cfg)
    t0 = time.time()
    mk = np.asarray(kfn(jnp.asarray(packed), model.peq_ad, model.peq_adc,
                        model.peq_tso))
    print(f"kernel compile+run: {time.time() - t0:.1f}s")
    r_run = cfg.readscanner.min_adapter3p_matches
    a, b = mj.copy(), mk.copy()
    a[eg.ROW_AD_RUN] = a[eg.ROW_AD_RUN] >= r_run
    b[eg.ROW_AD_RUN] = b[eg.ROW_AD_RUN] >= r_run
    ok = np.array_equal(a, b)
    if not ok:
        bad = np.nonzero((a != b).any(axis=0))[0]
        print(f"MISMATCH rows for reads {bad[:10]}")
        for i in bad[:3]:
            rr = np.nonzero(a[:, i] != b[:, i])[0]
            print(f"  read {i} (len {len(seqs[i])}): rows {rr}",
                  a[rr, i], b[rr, i])
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


def main_tiles(seed=31):
    """Tile-scan kernel vs the jnp inner on chimera-bearing long reads."""
    import jax.numpy as jnp

    from sicelore_tpu.models import readscan
    from sicelore_tpu.ops import tilescan_tpu
    from sicelore_tpu.utils import synth
    from sicelore_tpu.utils.config import PipelineConfig

    rng = np.random.default_rng(seed)
    cfg = PipelineConfig()
    wl = synth.make_whitelist(rng, 16)
    seqs = []
    for i in range(400):
        u = i % 5
        if u == 0:
            r = synth.make_chimera(rng, wl[i % 16], wl[(i + 3) % 16],
                                   cdna_len=int(rng.integers(400, 1200)))
        elif u == 1:
            r = synth.make_read(rng, wl[i % 16],
                                cdna_len=int(rng.integers(2000, 9000)),
                                error_rate=0.06, reverse=bool(i % 2))
        else:
            r = synth.make_read(rng, wl[i % 16],
                                cdna_len=int(rng.integers(500, 2000)),
                                error_rate=0.06, reverse=bool(i % 2))
        seqs.append(r["seq"])
    # N runs inside long reads: the 2-bit tile rows alias N, so these
    # tiles must flow through the dirty-tile nibble fallback (round 5)
    for i in range(0, 400, 37):
        s = bytearray(seqs[i])
        if len(s) > 1200:
            pos = len(s) // 2
            s[pos:pos + 5] = b"NNNNN"
            seqs[i] = bytes(s)
    rows, read_idx, g0s = readscan.build_tiles(seqs, cfg)
    T = len(rows)
    model = readscan.ReadScanModel(cfg)
    inner = readscan._make_internal_tile_inner(cfg)
    S = 256
    Tpad = (T + S - 1) // S * S
    rows_p = np.zeros((Tpad, rows.shape[1]), np.uint8)
    rows_p[:T] = rows
    outs = [np.asarray(inner(jnp.asarray(rows_p[o:o + S]), model.peq_adc))
            for o in range(0, Tpad, S)]
    ref = np.concatenate(outs, axis=1)[:, :T].astype(np.int32)
    kfn = tilescan_tpu.make_tile_scan_kernel(cfg)
    Tp = readscan.bucket_length(T, 1024)
    rows_tm, dirty = readscan.tiles_to_2bit_tm(rows, Tp)
    print(f"tiles: {T} ({int(dirty.sum())} dirty)")
    t0 = time.time()
    got = np.asarray(kfn(jnp.asarray(rows_tm)))[:, :T].astype(np.int32)
    print(f"tile kernel compile+run: {time.time() - t0:.1f}s")
    didx = np.nonzero(dirty)[0]
    if len(didx):
        got[:, didx] = model._dirty_tile_scan(rows[didx])
    ok = np.array_equal(ref, got)
    if not ok:
        bad = np.nonzero((ref != got).any(axis=0))[0]
        print(f"MISMATCH tiles {bad[:10]}")
        for t in bad[:5]:
            print(f"  tile {t}: ref {ref[:, t]} got {got[:, t]}")
    # full model path (async dispatch + dirty merge + split extraction)
    h = model.internal_tiles_async(seqs)
    splits, discard = model.finish_internal_tiles(h)
    exp_h = ([jnp.asarray(o.astype(np.int16)) for o in
              [np.concatenate(outs, axis=1)[:, :T]]],
             read_idx, g0s, T, None)
    esplits, ediscard = model.finish_internal_tiles(exp_h)
    ok2 = splits == esplits and discard == ediscard
    if not ok2:
        print(f"MODEL-PATH MISMATCH: {len(splits)} vs {len(esplits)} "
              f"splits, {len(discard)} vs {len(ediscard)} discards")
    print("TILE PARITY OK" if ok and ok2 else "TILE PARITY FAIL")
    return 0 if ok and ok2 else 1


if __name__ == "__main__":
    rc = main()
    rc |= main_tiles()
    sys.exit(rc)
