import numpy as np

from sicelore_tpu.ops import scan
from sicelore_tpu.utils import dna


def batch(*seqs, L=None):
    return dna.encode_batch([s.encode() for s in seqs], max_len=L)


def test_polya_find_3p():
    # clean polyA 20nt ending 10 from the end
    s = "CGT" * 30 + "A" * 20 + "CGTCGTCGTC"
    seqs, lens = batch(s)
    found, start, end = scan.polyat_find(
        seqs, lens, base=dna.A, k=15, min_count=12, window=150, from_end=True)
    assert bool(found[0])
    assert int(start[0]) == 90
    assert int(end[0]) == 109


def test_polya_respects_window():
    # polyA too far from the 3' end
    s = "A" * 20 + "CGT" * 100
    seqs, lens = batch(s)
    found, _, _ = scan.polyat_find(
        seqs, lens, base=dna.A, k=15, min_count=12, window=150, from_end=True)
    assert not bool(found[0])


def test_polyt_find_5p():
    s = "GC" * 5 + "T" * 18 + "CGT" * 40
    seqs, lens = batch(s)
    found, start, end = scan.polyat_find(
        seqs, lens, base=dna.T, k=15, min_count=12, window=150, from_end=False)
    assert bool(found[0])
    # the UMI-facing boundary (start, 5' side) must be exact; the cDNA-facing
    # boundary may over-extend by < k under the fraction policy
    assert int(start[0]) == 10
    assert 27 <= int(end[0]) <= 27 + 14


def test_polya_with_interruptions():
    # 75% A over the window: AAAAACAAAAACAAAAAC pattern passes 12/15
    s = "CGT" * 20 + ("AAAAA" + "C") * 5 + "G" * 5
    seqs, lens = batch(s)
    found, start, end = scan.polyat_find(
        seqs, lens, base=dna.A, k=15, min_count=12, window=150, from_end=True)
    assert bool(found[0])
    # tightened to first/last A of the run
    assert dna.decode(np.asarray(seqs[0][int(start[0]):int(end[0]) + 1]))[0] == "A"


def test_polya_padding_is_ignored():
    s1 = "CGT" * 30 + "A" * 20
    s2 = "CGT" * 10  # much shorter, padded
    seqs, lens = batch(s1, s2)
    found, _, _ = scan.polyat_find(
        seqs, lens, base=dna.A, k=15, min_count=12, window=150, from_end=True)
    assert bool(found[0]) and not bool(found[1])


def test_internal_polyat():
    s = "CGT" * 30 + "A" * 25 + "CGT" * 30  # internal polyA, far from both ends
    seqs, lens = batch(s)
    found, pos = scan.internal_polyat(
        seqs, lens, base=dna.A, k=15, min_count=12, edge_exclusion=60)
    assert bool(found[0])
    assert 80 <= int(pos[0]) <= 100
    # same run near the end -> not internal
    s2 = "CGT" * 30 + "A" * 25
    seqs2, lens2 = batch(s2)
    found2, _ = scan.internal_polyat(
        seqs2, lens2, base=dna.A, k=15, min_count=12, edge_exclusion=60)
    assert not bool(found2[0])


def test_adapter_search_exact_and_mutated():
    adapter = "CTTCCGATCT"
    peq, m = scan.peq_single(adapter)
    w1 = "ACGTACGTAC" + adapter + "GGGGG"       # exact at 10..19
    w2 = "ACGTACGTAC" + "CTTCCTATCT" + "GGGGG"  # 1 sub
    w3 = "ACGTACGTACGTACGTACGTACGTA"            # absent
    wins, _ = batch(w1, w2, w3, L=25)
    ed, pos = scan.adapter_search(wins, peq, m)
    assert int(ed[0]) == 0 and int(pos[0]) == 19
    assert int(ed[1]) == 1
    assert int(ed[2]) >= 5


def test_match_run_stats():
    tso = dna.encode("AACGCAGAGTACATGG")
    # window contains first 9 bases exact, then junk, then last 5 exact
    w = "TT" + "AACGCAGAG" + "CCCC" + "CATGG" + "TTTT"
    wins, _ = batch(w)
    best, second = scan.match_run_stats(wins, tso, 16)
    assert int(best[0]) == 9
    assert int(second[0]) >= 4


def test_min_count_for():
    assert scan.min_count_for(15, 0.75) == 12
    assert scan.min_count_for(15, 0.70) == 11
    assert scan.min_count_for(20, 0.75) == 15


def test_run_bailout_vs_oracle():
    """run_bailout == brute-force 'single run >= c1 OR column-disjoint
    pair summing >= c2' over maximal diagonal match runs."""
    import jax.numpy as jnp

    from sicelore_tpu.ops import scan as scanops

    rng = np.random.default_rng(17)
    m, W, B = 16, 90, 256
    pattern = rng.integers(0, 4, m).astype(np.int8)
    # biased windows: embed noisy pattern copies to create runs
    wins = rng.integers(0, 4, (B, W)).astype(np.int8)
    for b in range(B):
        for _ in range(rng.integers(0, 3)):
            p0 = int(rng.integers(0, W - m))
            frag = pattern.copy()
            nmut = int(rng.integers(0, 6))
            for _ in range(nmut):
                frag[rng.integers(0, m)] = rng.integers(0, 4)
            wins[b, p0:p0 + m] = frag

    def oracle(win, c1, c2):
        runs = []  # (start_col, end_col, len) of maximal diagonal runs
        for d in range(-m + 1, W):  # diagonal: col - row
            ln = 0
            for i in range(m):
                j = i + d
                if 0 <= j < W and win[j] == pattern[i]:
                    ln += 1
                else:
                    if ln:
                        runs.append((j - ln, j - 1, ln))
                    ln = 0
            if ln:
                j = m + d
                runs.append((j - ln, j - 1, ln))
        if any(r[2] >= c1 for r in runs):
            return True
        for a in runs:
            for b2 in runs:
                if (a[1] < b2[0] or b2[1] < a[0]) and a[2] + b2[2] >= c2:
                    return True
        return False

    for c1, c2 in ((8, 12), (6, 10), (10, 14)):
        got = np.asarray(scanops.run_bailout(
            jnp.asarray(wins), jnp.asarray(pattern), m, c1, c2))
        want = np.array([oracle(wins[b], c1, c2) for b in range(B)])
        assert np.array_equal(got, want), (c1, c2, np.nonzero(got != want))
