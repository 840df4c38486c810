"""ReadScanModel forward-step tests on synthetic library-structure reads."""
import numpy as np
import pytest

from sicelore_tpu.models.readscan import ReadScanModel, bucket_length
from sicelore_tpu.ops import editdist
from sicelore_tpu.utils import dna, synth


@pytest.fixture(scope="module")
def model():
    return ReadScanModel()


def _scan(model, reads):
    seqs, quals, lens = synth.reads_to_batch(
        reads, bucket_length(max(len(r["seq"]) for r in reads)))
    return model(seqs, quals, lens), lens


def test_fwd_read_geometry(model):
    rng = np.random.default_rng(0)
    bc = synth.random_seq(rng, 16)
    # rc(umi) must not start with A or PE tightening absorbs it into polyA
    reads = [synth.make_read(rng, bc, umi="ACGTACGTACGC", cdna_len=300,
                             polya_len=18)]
    out, lens = _scan(model, reads)
    L = int(lens[0])
    assert bool(out["stranded"][0]) and bool(out["is_fwd"][0])
    # layout: TSO(16) cDNA(300) A*18 rcUMI(12) rcBC(16) rcAdapter(22)
    ps, pe, ae = int(out["ps"][0]), int(out["pe"][0]), int(out["ae"][0])
    # PS/PE can absorb adjacent A's of cDNA/rcUMI (indistinguishable from
    # polyA); AE is exact.
    assert abs(ps - (16 + 300)) <= 2
    assert abs(pe - (16 + 300 + 18 - 1)) <= 2
    assert ae == 16 + 300 + 18 + 12 + 16  # first rcAdapter base
    assert int(out["adapter_ed"][0]) == 0
    assert int(out["tso_end"][0]) == 15
    # BC window (sense orientation) contains the exact barcode
    w = dna.decode(out["bc_windows"][0]).replace(".", "")
    assert bc in w


def test_rev_read_geometry(model):
    rng = np.random.default_rng(1)
    bc = synth.random_seq(rng, 16)
    reads = [synth.make_read(rng, bc, umi="ACGTACGTACGC", cdna_len=250,
                             polya_len=20, reverse=True)]
    out, lens = _scan(model, reads)
    assert bool(out["stranded"][0]) and not bool(out["is_fwd"][0])
    ps, pe, ae = int(out["ps"][0]), int(out["pe"][0]), int(out["ae"][0])
    assert abs(ps - (16 + 250)) <= 2
    assert abs(pe - (16 + 250 + 20 - 1)) <= 2
    assert ae == 16 + 250 + 20 + 12 + 16
    w = dna.decode(out["bc_windows"][0]).replace(".", "")
    assert bc in w
    assert int(out["tso_end"][0]) == 15


def test_noisy_reads_mostly_stranded(model):
    rng = np.random.default_rng(2)
    wl = synth.make_whitelist(rng, 8)
    reads = [synth.make_read(rng, wl[i % 8], cdna_len=int(rng.integers(150, 800)),
                             error_rate=0.07, reverse=bool(i % 2))
             for i in range(64)]
    out, _ = _scan(model, reads)
    frac = float(np.mean(out["stranded"]))
    assert frac > 0.85, frac
    # strand calls correct for the stranded ones
    want_fwd = np.array([not r["reverse"] for r in reads])
    agree = np.mean((out["is_fwd"] == want_fwd)[out["stranded"]])
    assert agree > 0.95, agree


def test_bc_recovery_via_sweep(model):
    """End-to-end: scan -> BC window -> Myers sweep finds the true barcode."""
    rng = np.random.default_rng(3)
    wl = synth.make_whitelist(rng, 64)
    idx_truth = rng.integers(0, 64, 32)
    reads = [synth.make_read(rng, wl[t], error_rate=0.05, reverse=bool(i % 2))
             for i, t in enumerate(idx_truth)]
    out, _ = _scan(model, reads)
    pats, _ = dna.encode_batch([w.encode() for w in wl], 16)
    peq = editdist.build_peq(pats)
    import jax.numpy as jnp
    ed, _pos = editdist.myers_sweep(jnp.asarray(out["bc_windows"]),
                                    jnp.asarray(peq), 16)
    got = np.argmin(np.asarray(ed), axis=1)
    ok = (got == idx_truth) & np.asarray(out["stranded"])
    assert ok.mean() > 0.9, ok.mean()


def test_unstranded_garbage(model):
    rng = np.random.default_rng(4)
    reads = [{"seq": synth.random_seq(rng, 500).encode(),
              "qual": b"I" * 500} for _ in range(8)]
    out, _ = _scan(model, reads)
    assert float(np.mean(out["stranded"])) < 0.3


def test_5p_chemistry_geometry():
    from sicelore_tpu.utils.config import PipelineConfig
    cfg = PipelineConfig(chemistry="5p")
    m5 = ReadScanModel(cfg)
    rng = np.random.default_rng(7)
    bc = synth.random_seq(rng, 16)
    for reverse in (False, True):
        r = synth.make_read_5p(rng, bc, umi="ACGTACGTACGC", cdna_len=300,
                               polya_len=18, reverse=reverse)
        seqs, quals, lens = synth.reads_to_batch([r], 1024)
        out = m5(seqs, quals, lens)
        assert bool(out["stranded"][0])
        assert bool(out["is_fwd"][0]) == (not reverse)
        # layout: ADAPTER(22) BC(16) UMI(12) TSO(16) cDNA(300) polyA(18)...
        assert int(out["ae"][0]) == 21  # last adapter base
        w = dna.decode(out["bc_windows"][0]).replace(".", "")
        assert bc in w
        assert int(out["tso_end"][0]) == 21 + 16 + 12 + 16  # last TSO base
        ps = int(out["ps"][0])
        # PS absorbs trailing cDNA A's (indistinguishable from polyA)
        assert abs(ps - (22 + 16 + 12 + 16 + 300)) <= 5


def test_5p_noisy_bc_recovery():
    from sicelore_tpu.utils.config import PipelineConfig
    from sicelore_tpu.ops import editdist
    import jax.numpy as jnp
    cfg = PipelineConfig(chemistry="5p")
    m5 = ReadScanModel(cfg)
    rng = np.random.default_rng(8)
    wl = synth.make_whitelist(rng, 32)
    idx = rng.integers(0, 32, 24)
    reads = [synth.make_read_5p(rng, wl[t], error_rate=0.06,
                                reverse=bool(i % 2))
             for i, t in enumerate(idx)]
    seqs, quals, lens = synth.reads_to_batch(
        reads, bucket_length(max(len(r["seq"]) for r in reads)))
    out = m5(seqs, quals, lens)
    pats, _ = dna.encode_batch([w.encode() for w in wl], 16)
    ed, _ = editdist.myers_sweep(jnp.asarray(out["bc_windows"]),
                                 jnp.asarray(editdist.build_peq(pats)), 16)
    got = np.argmin(np.asarray(ed), axis=1)
    ok = (got == idx) & np.asarray(out["stranded"])
    assert ok.mean() > 0.85, ok.mean()


def test_internal_sites_chimera(model):
    rng = np.random.default_rng(5)
    wl = synth.make_whitelist(rng, 4)
    chim = synth.make_chimera(rng, wl[0], wl[1], cdna_len=400)
    normal = synth.make_read(rng, wl[2], cdna_len=900)
    seqs, quals, lens = synth.reads_to_batch(
        [chim, normal], bucket_length(len(chim["seq"])))
    out = model.scan_internal(seqs, lens)
    # chimeric read: internal polyA (molecule 1's tail) away from edges,
    # confirmed by a complete-adapter match in the junction cassette
    assert int(out["n_internal_a"][0]) >= 1
    assert int(out["internal_a_ed"][0, 0]) <= 5
    assert int(out["n_internal_a"][1]) == 0
    # split position: just after molecule 1's cassette = len(read1)
    len1 = len(synth.TSO) + 400 + 20 + 12 + 16 + 22
    assert abs(int(out["internal_a_split"][0, 0]) - len1) <= 3


def test_composite_long_read_remap(model):
    """A long read (> 2*EDGE) scanned via composite must report true coords."""
    rng = np.random.default_rng(6)
    bc = synth.random_seq(rng, 16)
    r = synth.make_read(rng, bc, umi="ACGTACGTACGC", cdna_len=3000,
                        polya_len=18)
    out = model.scan_reads([r["seq"]], [r["qual"]])
    ae = int(out["ae"][0])
    assert bool(out["stranded"][0]) and bool(out["is_fwd"][0])
    assert ae == 16 + 3000 + 18 + 12 + 16
    # REV long read too
    r2 = synth.make_read(rng, bc, umi="ACGTACGTACGC", cdna_len=2500,
                         polya_len=20, reverse=True)
    out2 = model.scan_reads([r2["seq"]], [r2["qual"]])
    assert bool(out2["stranded"][0]) and not bool(out2["is_fwd"][0])
    assert int(out2["ae"][0]) == 16 + 2500 + 20 + 12 + 16


def test_precompile_warm_smoke(monkeypatch):
    """precompile.warm runs every pipeline kernel once (CPU backend)."""
    from sicelore_tpu.models import readscan
    from sicelore_tpu.utils import precompile
    monkeypatch.setattr(readscan.ReadScanModel, "SLICE", 256)
    monkeypatch.setattr(readscan.ReadScanModel, "MAX_C", 2)
    times = precompile.warm(n_bc=64, full=False, log=lambda *a: None)
    assert set(times) == {"scan_search_C1", "scan_search_C2",
                          "pass1_C1", "pass1_C2", "fallback_int8",
                          "tiles_64", "tiles_512",
                          "consensus_L256", "consensus_L512"}


def test_native_encode_matches_numpy():
    """native/hostenc encode_composite_2bit must be byte-identical to the
    numpy fallback (packed codes, quals, lens, dirty) and its qsum must
    equal the composite qual row sums."""
    from sicelore_tpu.io import native
    from sicelore_tpu.models.readscan import (EDGE, encode_composite,
                                              pack_2bit_np)
    from sicelore_tpu.utils import dna

    ext = native.get_hostenc()
    if ext is None:
        import pytest
        pytest.skip("native hostenc unavailable")
    rng = np.random.default_rng(11)
    seqs, quals = [], []
    for L in (0, 1, 4, 16, 303, 304, 305, 607, 608, 609, 2000):
        s = synth.random_seq(rng, L).encode() if L else b""
        if L >= 10:  # sprinkle N and lowercase
            s = s[:3] + b"N" + s[4:8] + b"acgt"[:2] + s[10:]
        seqs.append(s)
        quals.append(bytes(rng.integers(33, 74, L, dtype=np.uint8)))
    B, W = len(seqs), 2 * EDGE
    p, q, cl, tl, dr, qs = ext.encode_composite_2bit(seqs, quals, EDGE)
    packed = np.frombuffer(p, np.uint8).reshape(B, EDGE // 2)
    qv = np.frombuffer(q, np.int8).reshape(B, W)
    codes_ref, qv_ref, cl_ref, tl_ref = encode_composite(seqs, quals)
    cols = np.arange(W, dtype=np.int32)[None, :]
    dirty_ref = ((codes_ref == dna.N_CODE)
                 & (cols < cl_ref[:, None])).any(axis=1)
    assert np.array_equal(packed, pack_2bit_np(codes_ref))
    assert np.array_equal(qv, qv_ref)
    assert np.array_equal(np.frombuffer(cl, np.int32), cl_ref)
    assert np.array_equal(np.frombuffer(tl, np.int32), tl_ref)
    assert np.array_equal(np.frombuffer(dr, np.uint8).astype(bool), dirty_ref)
    assert np.array_equal(np.frombuffer(qs, np.int32),
                          qv_ref.sum(axis=1, dtype=np.int32))


def test_native_encode_tm_matches_numpy():
    """native encode_composite_tm must be byte-identical to the numpy
    fallback (two-half text-major layout incl. dirty/qsum)."""
    import sicelore_tpu.io.native as nat
    from sicelore_tpu.ops import edgescan as eg
    ext = nat.get_hostenc()
    if ext is None or not hasattr(ext, "encode_composite_tm"):
        import pytest
        pytest.skip("native hostenc unavailable")
    rng = np.random.default_rng(9)
    from sicelore_tpu.utils import synth
    wl = synth.make_whitelist(rng, 8)
    seqs, quals = [], []
    for i in range(300):
        r = synth.make_read(rng, wl[i % 8],
                            cdna_len=int(rng.integers(10, 1500)),
                            error_rate=0.05, reverse=bool(i % 2))
        seqs.append(r["seq"])
        quals.append(r["qual"])
    seqs[3] = seqs[3][:50] + b"N" + seqs[3][51:]
    seqs[11] = b"ACGTN" * 2
    quals[11] = b"IIIII" * 2
    B = len(seqs)
    saved, nat._hostenc = nat._hostenc, None
    saved_t, nat._hostenc_tried = nat._hostenc_tried, True
    try:
        p0, q0, l0, d0, s0 = eg.encode_composite_tm(seqs, quals)
    finally:
        nat._hostenc, nat._hostenc_tried = saved, saved_t
    p, q, tl, dr, qs = ext.encode_composite_tm(seqs, quals, eg.E)
    assert np.array_equal(
        np.frombuffer(p, np.uint8).reshape(eg.PACK_ROWS, B), p0)
    assert np.array_equal(
        np.frombuffer(q, np.int8).reshape(B, 2 * eg.E), q0)
    assert np.array_equal(np.frombuffer(tl, np.int32), l0)
    assert np.array_equal(np.frombuffer(dr, np.uint8).astype(bool), d0)
    assert np.array_equal(np.frombuffer(qs, np.int32), s0)


def test_encode_tiles_native_matches_numpy():
    """native encode_tiles must be byte-identical to the numpy build_tiles
    fallback (ADVICE r3)."""
    import sicelore_tpu.io.native as nat
    from sicelore_tpu.models.readscan import build_tiles
    from sicelore_tpu.utils.config import PipelineConfig
    ext = nat.get_hostenc()
    if ext is None or not hasattr(ext, "encode_tiles"):
        import pytest
        pytest.skip("native hostenc unavailable")
    cfg = PipelineConfig()
    rng = np.random.default_rng(13)
    seqs = []
    for i in range(60):
        L = int(rng.integers(100, 5000))
        s = bytearray(rng.choice(np.frombuffer(b"ACGT", np.uint8), L))
        if i % 9 == 4:
            s[L // 2] = ord("N")
        seqs.append(bytes(s))
    rows_n, ri_n, g0_n = build_tiles(seqs, cfg)      # native (ext present)
    saved, nat._hostenc = nat._hostenc, None
    saved_t, nat._hostenc_tried = nat._hostenc_tried, True
    try:
        rows_p, ri_p, g0_p = build_tiles(seqs, cfg)  # numpy fallback
    finally:
        nat._hostenc, nat._hostenc_tried = saved, saved_t
    assert np.array_equal(ri_n, ri_p)
    assert np.array_equal(g0_n, g0_p)
    assert np.array_equal(rows_n, rows_p)


def test_tile_scan_detects_synthetic_chimeras():
    """Tiled chimera scan semantics on synthetic junctions (ADVICE r3):
    single-junction chimeras split once, multi-junction reads are
    discarded, clean long reads produce no splits."""
    from sicelore_tpu.utils.config import PipelineConfig
    cfg = PipelineConfig()
    model = ReadScanModel(cfg)
    rng = np.random.default_rng(14)
    wl = synth.make_whitelist(rng, 8)
    seqs, want_split, want_discard = [], set(), set()
    for i in range(24):
        u = i % 4
        if u == 0:  # clean long read
            r = synth.make_read(rng, wl[i % 8], cdna_len=3000,
                                error_rate=0.03)
            seqs.append(r["seq"])
        elif u == 1:  # single chimera (A-junction + T-junction cassette)
            r = synth.make_chimera(rng, wl[i % 8], wl[(i + 3) % 8],
                                   cdna_len=900)
            seqs.append(r["seq"])
            want_split.add(i)
        elif u == 2:  # double chimera -> multi-junction discard
            r1 = synth.make_chimera(rng, wl[i % 8], wl[(i + 1) % 8],
                                    cdna_len=900)
            r2 = synth.make_read(rng, wl[(i + 2) % 8], cdna_len=900,
                                 error_rate=0.02)
            seqs.append(r1["seq"] + r2["seq"])
            want_discard.add(i)
        else:  # short read: no tiles at all
            r = synth.make_read(rng, wl[i % 8], cdna_len=200,
                                error_rate=0.03)
            seqs.append(r["seq"])
    splits, discard = model.finish_internal_tiles(
        model.internal_tiles_async(seqs))
    for i in want_split:
        assert i in splits and len(splits[i]) == 1, (i, splits.get(i))
        # the split must land near the junction (between the two cDNAs)
        j = splits[i][0]
        assert 0 < j < len(seqs[i])
    for i in want_discard:
        assert i in discard or i in splits, i
    for i in range(24):
        if i % 4 in (0, 3):
            assert i not in splits and i not in discard, i
