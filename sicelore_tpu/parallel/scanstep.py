"""Multi-chip sharded read-scan step (data x barcode 2D mesh).

The reference scales by per-file worker threads on one JVM
(/root/reference SURVEY §2.d: work-stealing pool over fastq chunks); the
TPU-native equivalent shards the same computation over a device mesh:

  * axis "data": read batches are data-parallel (each chip scans its shard
    of reads) — the analog of the jar's chunk workers.
  * axis "bc": the used-barcode list is model-parallel (each chip sweeps its
    shard of barcodes); per-read best/second-best are combined with an
    all_gather + min-merge along the axis — the analog of sharding the
    whitelist hash probes.

Built with shard_map over jax.sharding.Mesh so the same code runs on a
virtual CPU mesh (tests / driver dry-run) and a real TPU slice; collectives
ride ICI when the mesh maps to a slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sicelore_tpu.models import readscan
from sicelore_tpu.ops import editdist
from sicelore_tpu.utils.config import PipelineConfig

INT_MAX = editdist.INT_MAX


def make_mesh(n_data: int, n_bc: int, devices=None) -> Mesh:
    devices = np.array(devices if devices is not None
                       else jax.devices()[:n_data * n_bc])
    return Mesh(devices.reshape(n_data, n_bc), ("data", "bc"))


def make_sharded_scan_step(mesh: Mesh, cfg: PipelineConfig | None = None,
                           m: int = 16):
    """Build the jitted multi-chip step: edge scan + sharded BC sweep.

    Returns step(seqs, quals, lens, peq_ad, peq_adc, peq_tso, peq_bc, nvalid)
    -> (scan_out dict, bc_out dict). Shapes: seqs/quals [B, L] (B divisible
    by mesh.data), peq_bc [4, N] (N divisible by mesh.bc); nvalid [1] int32
    is the true barcode count (tail lanes masked).
    """
    cfg = cfg or PipelineConfig()
    edge_fn = readscan.make_edge_scan_fn(cfg)
    n_bc = mesh.shape["bc"]

    def bc_shard_sweep(windows, peq_local, nvalid):
        """Per-device: sweep local barcode shard, merge along "bc" axis."""
        ed, pos = editdist.myers_sweep(windows, peq_local, m)
        n_local = peq_local.shape[1]
        shard = jax.lax.axis_index("bc")
        gidx = shard * n_local + jnp.arange(n_local, dtype=jnp.int32)[None, :]
        ed = jnp.where(gidx < nvalid[0], ed, INT_MAX)
        b1 = jnp.min(ed, axis=1)
        i1_local = jnp.argmin(ed, axis=1).astype(jnp.int32)
        i1 = shard * n_local + i1_local
        masked = jnp.where(jnp.arange(n_local)[None, :] == i1_local[:, None],
                           INT_MAX, ed)
        b2 = jnp.min(masked, axis=1)
        p1 = jnp.take_along_axis(pos, i1_local[:, None], axis=1)[:, 0]
        # gather candidates from every bc shard and min-merge
        cand = jax.lax.all_gather(
            jnp.stack([b1, i1, b2, p1], axis=0), "bc")  # [n_bc, 4, b]
        best = cand[0]
        for s in range(1, n_bc):
            nb1, ni1, nb2, np1 = cand[s, 0], cand[s, 1], cand[s, 2], cand[s, 3]
            take = nb1 < best[0]
            second = jnp.minimum(jnp.maximum(best[0], nb1),
                                 jnp.minimum(best[2], nb2))
            best = jnp.stack([jnp.minimum(best[0], nb1),
                              jnp.where(take, ni1, best[1]),
                              second,
                              jnp.where(take, np1, best[3])], axis=0)
        return best  # [4, b_local] replicated along "bc"

    @functools.partial(
        jax.jit,
        in_shardings=(
            jax.sharding.NamedSharding(mesh, P("data", None)),  # seqs
            jax.sharding.NamedSharding(mesh, P("data")),        # lens
            jax.sharding.NamedSharding(mesh, P()),              # peq_ad
            jax.sharding.NamedSharding(mesh, P()),              # peq_adc
            jax.sharding.NamedSharding(mesh, P()),              # peq_tso
            jax.sharding.NamedSharding(mesh, P(None, "bc")),    # peq_bc
            jax.sharding.NamedSharding(mesh, P()),              # nvalid
        ))
    def step(seqs, lens, peq_ad, peq_adc, peq_tso, peq_bc, nvalid):
        # data-parallel edge scan: plain jit + shardings, XLA partitions it
        out = edge_fn(seqs, lens, peq_ad, peq_adc, peq_tso)
        # sharded BC sweep: explicit shard_map for the cross-shard merge
        # check_vma=False: myers_sweep's scan carries start from constants,
        # which the varying-axes checker rejects inside shard_map
        sweep = jax.shard_map(
            bc_shard_sweep, mesh=mesh,
            in_specs=(P("data", None), P(None, "bc"), P()),
            out_specs=P(None, "data"), check_vma=False)
        best = sweep(out["bc_windows"].astype(jnp.int32), peq_bc, nvalid)
        bc_out = {"ed": best[0], "idx": best[1], "ed2": best[2],
                  "end_pos": best[3]}
        return out, bc_out

    return step
