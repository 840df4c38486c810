"""Device pairwise-ED path vs scalar host path."""
import numpy as np
import pytest

from sicelore_tpu.core.umicluster import (cluster_group, myers_ed,
                                          pairwise_ed)
from sicelore_tpu.utils import synth


def test_device_matches_host():
    rng = np.random.default_rng(0)
    umis = []
    for _ in range(60):
        n = int(rng.integers(10, 15))
        umis.append(synth.random_seq(rng, n).encode())
    # add some near-duplicates
    umis += [umis[0][:-1] + b"A", umis[1] + b"C", umis[2]]
    host = pairwise_ed(umis, use_device=False)
    dev = pairwise_ed(umis, use_device=True)
    assert (host == dev).all(), np.argwhere(host != dev)[:5]


def test_large_group_clustering_uses_device():
    rng = np.random.default_rng(1)
    base = [synth.random_seq(rng, 12) for _ in range(30)]
    umis, quals = [], []
    for b in base:
        for _ in range(3):
            u = b
            if rng.random() < 0.5:  # 1 sub
                p = int(rng.integers(0, 12))
                u = u[:p] + "ACGT"[int(rng.integers(0, 4))] + u[p + 1:]
            umis.append(u.encode())
            quals.append(30.0)
    cls = cluster_group(umis, quals)
    # ~30 clusters of 3 (occasional chance merges)
    sizes = sorted(len(c.members) for c in cls)
    assert 24 <= len(cls) <= 32
    assert sum(sizes) == 90
