"""MXU q-gram prefilter search vs brute Myers sweep (exact within radius).

The prefilter (ops/bcsearch.py qgram_prefilter_search) must reproduce the
brute sweep's best/second/position for every read whose best and second
EDs lie within the search radius, and report BIG beyond it (the reference
jar's bailout-radius semantics, SURVEY §2.a BarcodeMatchTester row).
"""
import numpy as np
import jax.numpy as jnp

from sicelore_tpu.ops import bcsearch, editdist
from sicelore_tpu.utils import dna, synth

BIG = bcsearch.BIG


def _mutate(rng, s: str, ned: int) -> str:
    codes = list(dna.encode(s))
    for _ in range(ned):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(codes)))
        if op == 0:
            codes[pos] = (codes[pos] + 1 + int(rng.integers(0, 3))) % 4
        elif op == 1 and len(codes) > 1:
            del codes[pos]
        else:
            codes.insert(pos, int(rng.integers(0, 4)))
    return dna.decode(np.array(codes, dtype=np.int8))


def _windows(rng, wl, B, W=22, err_eds=(0, 0, 1, 1, 2, 3)):
    wins = np.full((B, W), 5, np.int8)
    for b in range(B):
        bc = wl[int(rng.integers(0, len(wl)))]
        ed = err_eds[b % len(err_eds)]
        s = _mutate(rng, bc, ed)
        flank = "".join("ACGT"[int(x)] for x in rng.integers(0, 4, 8))
        full = (flank[:3] + s + flank[3:])[:W]
        wins[b, :len(full)] = dna.encode(full)
    return wins


def test_prefilter_matches_brute_within_radius():
    rng = np.random.default_rng(7)
    N, B, m, R = 600, 64, 16, 2
    wl = synth.make_whitelist(rng, N)
    pats, _ = dna.encode_batch([w.encode() for w in wl], m)
    peq = editdist.build_peq(pats)
    qt = bcsearch.build_qgram_table(pats)
    wins = _windows(rng, wl, B)

    out = np.asarray(bcsearch.qgram_prefilter_search(
        jnp.asarray(wins), jnp.asarray(qt), jnp.asarray(peq),
        jnp.asarray([N], np.int32), m, R, K=32))
    ed_all, pos_all = editdist.myers_sweep(jnp.asarray(wins),
                                           jnp.asarray(peq), m)
    ed_all = np.asarray(ed_all)
    b1, i1, b2, _ = (np.asarray(x) for x in editdist.best_two(jnp.asarray(ed_all)))

    assert not out[4].any(), "unexpected candidate overflow"
    for b in range(B):
        if b1[b] <= R:
            assert out[0, b] == b1[b], b
            assert out[1, b] == i1[b], b
            # second-best: exact when within radius, BIG beyond
            if b2[b] <= R:
                assert out[2, b] == b2[b], b
            else:
                assert out[2, b] == BIG, b
            # end position must match the brute kernel's for the same idx
            assert out[3, b] == np.asarray(pos_all)[b, i1[b]], b
        else:
            assert out[0, b] == BIG and out[1, b] == BIG, b


def test_prefilter_no_false_negative_on_indels():
    """Deletions/insertions shift alignment frames — the classic failure of
    Hamming-style prefilters; the q-gram bound must keep these."""
    rng = np.random.default_rng(3)
    N, m, R = 600, 16, 2
    wl = synth.make_whitelist(rng, N)
    pats, _ = dna.encode_batch([w.encode() for w in wl], m)
    peq = editdist.build_peq(pats)
    qt = bcsearch.build_qgram_table(pats)
    # windows = barcode with 1 deletion + 1 insertion at random spots
    B = 32
    wins = np.full((B, 22), 5, np.int8)
    targets = []
    for b in range(B):
        i = int(rng.integers(0, N))
        targets.append(i)
        codes = list(dna.encode(wl[i]))
        del codes[int(rng.integers(2, 14))]
        codes.insert(int(rng.integers(2, 14)), int(rng.integers(0, 4)))
        s = "AGT" + dna.decode(np.array(codes, np.int8)) + "CCA"
        wins[b, :len(s)] = dna.encode(s)
    out = np.asarray(bcsearch.qgram_prefilter_search(
        jnp.asarray(wins), jnp.asarray(qt), jnp.asarray(peq),
        jnp.asarray([N], np.int32), m, R, K=32))
    ed_all, _ = editdist.myers_sweep(jnp.asarray(wins), jnp.asarray(peq), m)
    b1, i1, _, _ = (np.asarray(x) for x in editdist.best_two(ed_all))
    for b in range(B):
        if b1[b] <= R:
            assert out[0, b] == b1[b] and out[1, b] == i1[b]


def test_prefilter_overflow_flag():
    """More than K threshold-passing candidates must raise the overflow
    flag (caller reroutes those reads through the exact sweep)."""
    # 40 near-identical barcodes (all within ED1 of each other)
    base = "ACGTACGTACGTACGT"
    wl = []
    for i in range(40):
        codes = list(dna.encode(base))
        codes[i % 16] = (codes[i % 16] + 1 + i // 16) % 4
        wl.append(dna.decode(np.array(codes, np.int8)))
    wl = sorted(set(wl))
    pats, _ = dna.encode_batch([w.encode() for w in wl], 16)
    peq = editdist.build_peq(pats)
    qt = bcsearch.build_qgram_table(pats)
    wins = np.full((4, 22), 5, np.int8)
    wins[:, :16] = dna.encode(base)
    out = np.asarray(bcsearch.qgram_prefilter_search(
        jnp.asarray(wins), jnp.asarray(qt), jnp.asarray(peq),
        jnp.asarray([len(wl)], np.int32), 16, 2, K=8))
    assert out[4].all()
