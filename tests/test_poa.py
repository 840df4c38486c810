"""Consensus engine tests: alignment, MSA, consensus accuracy."""
import numpy as np
import pytest

from sicelore_tpu.ops import poa
from sicelore_tpu.ops.editdist import levenshtein_np
from sicelore_tpu.utils import synth


def test_nw_align_exact():
    a, b = poa.nw_align_banded(b"ACGTACGT", b"ACGTACGT")
    assert a == b == b"ACGTACGT"


def test_nw_align_indel():
    a, b = poa.nw_align_banded(b"ACGTACGT", b"ACGACGT")  # T deleted
    assert a.replace(b"-", b"") == b"ACGTACGT"
    assert b.replace(b"-", b"") == b"ACGACGT"
    assert len(a) == len(b)
    # exactly one gap in b
    assert b.count(b"-") == 1 and a.count(b"-") == 0


def test_nw_align_lengths():
    rng = np.random.default_rng(0)
    for _ in range(10):
        s = synth.random_seq(rng, 300).encode()
        t = synth.mutate(rng, s.decode(), 0.1).encode()
        ra, rb = poa.nw_align_banded(s, t)
        assert ra.replace(b"-", b"") == s
        assert rb.replace(b"-", b"") == t
        assert len(ra) == len(rb)


def _noisy_copies(rng, truth: str, n: int, rate: float) -> list[bytes]:
    return [synth.mutate(rng, truth, rate).encode() for _ in range(n)]


@pytest.mark.parametrize("depth,rate", [(3, 0.05), (5, 0.08), (10, 0.10),
                                        (20, 0.12)])
def test_consensus_accuracy(depth, rate):
    """Consensus of noisy copies must be far more accurate than any read."""
    rng = np.random.default_rng(depth)
    truth = synth.random_seq(rng, 600)
    reads = _noisy_copies(rng, truth, depth, rate)
    cons, qv = poa.consensus_reads(reads)
    ed = levenshtein_np(cons.decode(), truth)
    read_eds = [levenshtein_np(r.decode(), truth) for r in reads]
    assert len(qv) == len(cons)
    # consensus error must beat the mean read error by a wide margin
    assert ed < 0.35 * np.mean(read_eds), (ed, np.mean(read_eds))
    if depth >= 10:
        assert ed <= 0.005 * len(truth) * 10, ed  # < ~3% residual


def test_consensus_1_and_2_reads():
    s1, s2 = b"ACGTACGTAA", b"ACGTACGTAAACG"
    c, q = poa.consensus_reads([s1])
    assert c == s1 and q == bytes([36]) * len(s1)  # 33 + MINPS(3)
    c, q = poa.consensus_reads([s1, s2])
    assert c == s2  # longest wins (Consensus.java:201-206)
    assert q == bytes([36]) * len(s2)


def test_qv_caps():
    reads = [b"ACGT"] * 5
    c, q = poa.consensus_reads(reads)
    assert c == b"ACGT"
    assert q == bytes([33 + 20]) * 4  # full agreement -> MAXPS
