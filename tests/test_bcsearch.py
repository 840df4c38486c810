import jax.numpy as jnp
import numpy as np

from sicelore_tpu.ops import bcsearch, editdist


def test_bc_search_jnp_path():
    rng = np.random.default_rng(2)
    m, W, B, N = 16, 22, 64, 100
    pats = rng.integers(0, 4, size=(N, m)).astype(np.int8)
    wins = rng.integers(0, 4, size=(B, W)).astype(np.int8)
    # plant barcode i at offset 3 in window i (exact)
    for i in range(min(B, N)):
        wins[i, 3:3 + m] = pats[i]
    peq = editdist.build_peq(pats)
    res = bcsearch.bc_search(wins, peq, N, m, use_pallas=False)
    for i in range(min(B, N)):
        assert res["ed"][i] == 0
        assert res["idx"][i] == i
        assert res["end_pos"][i] == 3 + m - 1


def test_bc_sweep_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(3)
    m, W = 16, 22
    bt, nt = 8, 128
    B, N = 16, 256
    n_valid = 200
    pats = rng.integers(0, 4, size=(n_valid, m)).astype(np.int8)
    wins = rng.integers(0, 4, size=(B, W)).astype(np.int8)
    for i in range(B):
        j = int(rng.integers(0, n_valid))
        wins[i, 2:2 + m] = pats[j]
    peq = np.zeros((4, N), dtype=np.uint32)
    peq[:, :n_valid] = editdist.build_peq(pats)

    out = np.asarray(bcsearch.bc_sweep_pallas(
        jnp.asarray(wins.astype(np.int32)), jnp.asarray(peq),
        jnp.asarray([n_valid], dtype=np.int32), m, bt=bt, nt=nt, interpret=True))

    ed_all, pos_all = editdist.myers_sweep(jnp.asarray(wins), jnp.asarray(peq[:, :n_valid]), m)
    b, i, s, _ = editdist.best_two(np.asarray(ed_all))
    np.testing.assert_array_equal(out[0], np.asarray(b))
    np.testing.assert_array_equal(out[1], np.asarray(i))
    np.testing.assert_array_equal(out[2], np.minimum(np.asarray(s), int(bcsearch.BIG)))
    np.testing.assert_array_equal(out[3], np.asarray(pos_all)[np.arange(B), np.asarray(i)])


def test_bc_search_second_best_sentinel():
    # single barcode -> ed2 must be INT_MAX like the reference's ed_sec
    pats = np.zeros((1, 16), dtype=np.int8)
    wins = np.zeros((4, 20), dtype=np.int8)
    peq = editdist.build_peq(pats)
    res = bcsearch.bc_search(wins, peq, 1, 16, use_pallas=False)
    assert (res["ed2"] == editdist.INT_MAX).all()
    assert (res["ed"] == 0).all()
