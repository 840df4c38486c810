"""Multi-chip sharded consensus step.

Consensus pairs (center, read) are embarrassingly data-parallel: each chip
runs the banded-DP + traceback voting kernel (ops.poa_tpu.consensus_votes)
on its shard of pairs, and per-molecule vote tensors merge with a psum —
molecules are assigned whole to a shard, so the psum simply gathers each
molecule's votes from the single chip that produced them (zero elsewhere).
This is the TPU analog of the reference's consensus thread pool
(MoleculeDataset.callConsensus, utils/MoleculeDataset.java:659-743) at
pod-slice scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sicelore_tpu.ops import poa_tpu


def make_sharded_consensus_step(mesh: Mesh, W: int, M: int,
                                data_axis: str = "data"):
    """Jitted fn(center [P, Lc], clens, reads [P, Lr], rlens, mol_ids) ->
    (col_votes [M, Lc+1, 5], ins_votes, pair_counts), with the pair batch
    sharded over `data_axis` (P divisible by the axis size; mol_ids are
    global molecule indices < M; keep one molecule's pairs on one shard for
    best locality — correctness holds either way since segment sums merge
    additively)."""
    axes = dict(mesh.shape)
    n_data = axes[data_axis]

    def local(center, clens, reads, rlens, mol_ids):
        cv, iv, pc = poa_tpu.consensus_votes(center, clens, reads, rlens,
                                             mol_ids, W, M)
        cv = jax.lax.psum(cv, data_axis)
        iv = jax.lax.psum(iv, data_axis)
        pc = jax.lax.psum(pc, data_axis)
        return cv, iv, pc

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis), P(data_axis, None),
                  P(data_axis), P(data_axis)),
        out_specs=(P(), P(), P()), check_vma=False)

    shardings = tuple(NamedSharding(mesh, s) for s in
                      (P(data_axis, None), P(data_axis),
                       P(data_axis, None), P(data_axis), P(data_axis)))
    return jax.jit(sharded, in_shardings=shardings), n_data
