"""Batched TPU consensus engine vs host engine + truth."""
import numpy as np
import pytest

from sicelore_tpu.ops import poa
from sicelore_tpu.ops.editdist import levenshtein_np
from sicelore_tpu.ops.poa_tpu import BatchedConsensusEngine
from sicelore_tpu.utils import synth


@pytest.fixture(scope="module")
def engine():
    return BatchedConsensusEngine(band=64)


def _mols(rng, n_mol, depth, rate, length):
    mols, truths = [], []
    for _ in range(n_mol):
        truth = synth.random_seq(rng, length)
        mols.append([synth.mutate(rng, truth, rate).encode()
                     for _ in range(depth)])
        truths.append(truth)
    return mols, truths


def test_device_engine_accuracy(engine):
    rng = np.random.default_rng(0)
    mols, truths = _mols(rng, 6, 8, 0.08, 500)
    res = engine(mols)
    for (cons, qv), truth, reads in zip(res, truths, mols):
        assert len(cons) == len(qv)
        ed = levenshtein_np(cons.decode(), truth)
        read_ed = np.mean([levenshtein_np(r.decode(), truth) for r in reads])
        assert ed < 0.3 * read_ed, (ed, read_ed)


def test_device_vs_host_equivalence(engine):
    """Device consensus must closely match the host center-star engine."""
    rng = np.random.default_rng(1)
    mols, truths = _mols(rng, 4, 6, 0.06, 400)
    dev = engine(mols)
    for (dc, dq), seqs, truth in zip(dev, mols, truths):
        hc, hq = poa.consensus_reads(seqs)
        # identical algorithms modulo banding/tie-breaks: small divergence
        assert levenshtein_np(dc.decode(), hc.decode()) <= 0.01 * len(hc) + 3


def test_device_engine_dispatch(engine):
    """1/2-read molecules short-circuit exactly like the reference."""
    res = engine([[b"ACGTACGTAA"],
                  [b"ACGTACGTAA", b"ACGTACGTAAACG"],
                  [b"ACGT" * 50] * 4])
    assert res[0][0] == b"ACGTACGTAA"
    assert res[1][0] == b"ACGTACGTAAACG"
    assert res[2][0] == b"ACGT" * 50
    assert res[2][1] == bytes([53]) * 200  # full agreement -> 33+20


def test_mixed_length_buckets(engine):
    rng = np.random.default_rng(2)
    mols1, t1 = _mols(rng, 2, 5, 0.05, 200)
    mols2, t2 = _mols(rng, 2, 5, 0.05, 1500)
    res = engine(mols1 + mols2)
    for (cons, _), truth in zip(res, t1 + t2):
        assert levenshtein_np(cons.decode(), truth) < 0.05 * len(truth)
