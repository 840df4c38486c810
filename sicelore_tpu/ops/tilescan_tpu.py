"""Pallas TPU kernel for the tiled internal/chimera scan.

The round-3 tile scan ran detection + confirm as a jnp lax.map fusion —
measured ~750 ms per 32k-read chunk of device dispatch+drain, the largest
device term of the warm e2e (NOTES_ROUND4 item 2). Round 5: tile rows are
2-BIT packed (native/hostenc tiles2bit_tm, halving the 25 MB/32k-chunk
upload over the ~10-25 MB/s tunnel); tiles with an N inside tlen (rare)
are flagged dirty host-side and re-scanned by the exact jnp nibble inner
so N never aliases to a base. Here one kernel
instance processes 1024 tile rows on (sublane, lane) = [8, 128] with three
static column sweeps over the 1024-base tile:

  1. detection — sliding k-window A/T counts, run-start capture (first
     K_TILE_SITES starts of maximal passing stretches per direction,
     within the tile's ownership span)
  2. sense confirm — complete-adapter Myers states masked to the
     [sT_i - Wi, sT_i) windows of the K polyT sites (T-junctions)
  3. rc confirm (descending columns, complemented eq) — masked to the
     rc windows [sA_i, sA_i + Wi) of the K polyA sites (A-junctions)

then the confirmed-split dedup (first two distinct split positions +
multi-chimeric count) runs in registers, so the output is the same
[3, T] int16 contract as the jnp inner (models.readscan
finish_internal_tiles consumes either unchanged).

Semantics match models.readscan._make_internal_tile_inner exactly
(asserted on hardware by tests/tpu_edge_parity.py --tiles; the jnp inner
remains the CPU pipeline path). Reference behavior: ChimeraFindernew,
/root/reference/README.md:90-91,452-457.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sicelore_tpu.ops import scan as scanops
from sicelore_tpu.utils import dna
from sicelore_tpu.utils.config import PipelineConfig

TILE = 1024
META = 16
PACK_ROWS = TILE // 4 + META      # 2-bit text rows + meta byte rows
U = 16


def _tile_kernel(peq_ref, packed_ref, out_ref, T, *, k: int, mc: int,
                 m_adc: int, edmax: int, Wi: int, K: int):
    shp = (8, 128)
    zero = jnp.zeros(shp, jnp.int32)
    one = zero + 1

    def m(c):
        return jnp.where(c, one, zero)

    # ---- meta rows ----
    mb = [packed_ref[TILE // 4 + i].astype(jnp.int32) for i in range(16)]
    own_lo = mb[0] | (mb[1] << 8)
    own_hi = mb[2] | (mb[3] << 8)
    tlen = mb[4] | (mb[5] << 8)
    g0 = mb[8] | (mb[9] << 8) | (mb[10] << 16) | (mb[11] << 24)
    rlen = mb[12] | (mb[13] << 8) | (mb[14] << 16) | (mb[15] << 24)

    # ---- unpack 2-bit codes (4 bases/byte; N-containing tiles are
    # flagged dirty by the host converter and re-scanned on the exact
    # nibble jnp path — pad aliases beyond tlen are masked below) ----
    for blk in range(TILE // 4 // 8):
        rows = packed_ref[blk * 8:blk * 8 + 8]
        vals = []
        for q in range(8):
            b = rows[q].astype(jnp.int32)
            vals.append(b & 3)
            vals.append((b >> 2) & 3)
            vals.append((b >> 4) & 3)
            vals.append((b >> 6) & 3)
        T[blk * 32:blk * 32 + 32] = jnp.stack(vals, axis=0)

    # ---- phase 1: detection (run starts per direction) ----
    cA = cT = zero
    pokA = pokT = zero
    sA = [zero - 1 for _ in range(K)]
    sT = [zero - 1 for _ in range(K)]
    nA = nT = zero
    for blk in range(TILE // U):
        j0 = blk * U
        rows = T[j0:j0 + U]
        lag = T[max(j0 - U, 0):max(j0 - U, 0) + U]
        for u in range(U):
            j = j0 + u
            p = j - (k - 1)
            iA = m(rows[u] == dna.A)
            iT = m(rows[u] == dna.T)
            if j >= k:
                lA = (m(lag[u + U - k] == dna.A) if u < k
                      else m(rows[u - k] == dna.A))
                lT = (m(lag[u + U - k] == dna.T) if u < k
                      else m(rows[u - k] == dna.T))
                cA = cA + iA - lA
                cT = cT + iT - lT
            else:
                cA = cA + iA
                cT = cT + iT
            if p >= 0:
                pv = zero + p
                inown = (m(pv >= own_lo) * m(pv < own_hi)
                         * m(pv <= tlen - k))
                okA = m(cA >= mc) * inown
                okT = m(cT >= mc) * inown
                rsA = okA * (1 - pokA)
                rsT = okT * (1 - pokT)
                # pokA/pokT track `ok` at the PREVIOUS position (the jnp
                # inner's rs = ok & ~shift(ok) semantics)
                pokA, pokT = okA, okT
                for i in range(K):
                    prior_empty = m(sA[i] < 0)
                    take = rsA * prior_empty * (m(nA == i))
                    sA[i] = sA[i] * (1 - take) + p * take
                    del prior_empty
                    takeT = rsT * m(sT[i] < 0) * m(nT == i)
                    sT[i] = sT[i] * (1 - takeT) + p * takeT
                nA = nA + rsA * m(nA < K)
                nT = nT + rsT * m(nT < K)

    # ---- Myers helpers (single pattern: complete adapter) ----
    pq = [zero.astype(jnp.uint32) + jnp.uint32(peq_ref[0, c])
          for c in range(4)]
    full = jnp.uint32((1 << m_adc) - 1)
    hibit = jnp.uint32(m_adc - 1)

    def mstate():
        return (zero.astype(jnp.uint32) + full, zero.astype(jnp.uint32),
                zero + m_adc, zero + m_adc, zero - 1)

    def mstep(st, eq, jv):
        PV, MV, sc, best, bpos = st
        Xv = eq | MV
        Xh = (((eq & PV) + PV) ^ PV) | eq
        Ph = MV | ~(Xh | PV)
        Mh = PV & Xh
        sc = sc + ((Ph >> hibit) & jnp.uint32(1)).astype(jnp.int32)
        sc = sc - ((Mh >> hibit) & jnp.uint32(1)).astype(jnp.int32)
        Ph = Ph << jnp.uint32(1)
        Mh = Mh << jnp.uint32(1)
        PV = Mh | ~(Xv | Ph)
        MV = Ph & Xv
        imp = sc < best
        bpos = jnp.where(imp, jv, bpos)
        best = jnp.minimum(sc, best)
        return (PV, MV, sc, best, bpos)

    # ---- phase 2: sense confirm (T-junction windows [sT_i - Wi, sT_i)) --
    stT = [mstate() for _ in range(K)]
    los = [sT[i] - Wi for i in range(K)]
    for blk in range(TILE // U):
        j0 = blk * U
        rows = T[j0:j0 + U]
        for u in range(U):
            jv = zero + (j0 + u)
            ch = rows[u]
            valid = m(jv < tlen)
            e0 = m(ch == 0).astype(jnp.uint32) * pq[0]
            e1 = m(ch == 1).astype(jnp.uint32) * pq[1]
            e2 = m(ch == 2).astype(jnp.uint32) * pq[2]
            e3 = m(ch == 3).astype(jnp.uint32) * pq[3]
            eq_all = e0 | e1 | e2 | e3
            for i in range(K):
                w = (m(jv >= los[i]) * m(jv < sT[i]) * valid
                     ).astype(jnp.uint32)
                stT[i] = mstep(stT[i], eq_all * w, jv)

    # ---- phase 3: rc confirm (A-junction rc windows [sA_i, sA_i+Wi)) ----
    # rc coord r = TILE-1-c; window i = r - (TILE - Wi - sA_i)
    stA = [mstate() for _ in range(K)]
    rlos = [(TILE - Wi) - sA[i] for i in range(K)]
    rhis = [zero + TILE - sA[i] for i in range(K)]
    for blk in range(TILE // U):
        r0 = blk * U
        rows = T[TILE - r0 - U:TILE - r0]
        for u in range(U - 1, -1, -1):
            r = r0 + (U - 1 - u)
            rv = zero + r
            ch = rows[u]                      # tile col c = TILE-1-r
            valid = m((zero + (TILE - 1 - r)) < tlen)
            e0 = m(ch == 3).astype(jnp.uint32) * pq[0]
            e1 = m(ch == 2).astype(jnp.uint32) * pq[1]
            e2 = m(ch == 1).astype(jnp.uint32) * pq[2]
            e3 = m(ch == 0).astype(jnp.uint32) * pq[3]
            eq_all = e0 | e1 | e2 | e3
            for i in range(K):
                w = (m(rv >= rlos[i]) * m(rv < rhis[i]) * valid
                     ).astype(jnp.uint32)
                stA[i] = mstep(stA[i], eq_all * w, rv)

    # ---- combine: splits + dedup (first two distinct confirmed) ----
    spl = []
    okc = []
    for i in range(K):
        # A-junction: rc window pos i_e = r - rlos[i]; split = sA + Wi - 1
        # - i_e + m_adc
        a_pos = jnp.where(stA[i][4] >= 0, stA[i][4] - rlos[i], zero - 1)
        a_ed = jnp.where(sA[i] >= 0, stA[i][3], zero + 10**6)
        a_split = sA[i] + Wi - 1 - a_pos + m_adc
        ok = (m(sA[i] >= 0) * m(a_ed <= edmax))
        gp = g0 + a_split
        ok = ok * m(gp > 50) * m(gp < rlen - 50)
        spl.append(a_split)
        okc.append(ok)
    for i in range(K):
        t_pos = jnp.where(stT[i][4] >= 0, stT[i][4] - los[i], zero - 1)
        t_ed = jnp.where(sT[i] >= 0, stT[i][3], zero + 10**6)
        t_split = sT[i] - Wi + t_pos - (m_adc - 1)
        ok = (m(sT[i] >= 0) * m(t_ed <= edmax))
        gp = g0 + t_split
        ok = ok * m(gp > 50) * m(gp < rlen - 50)
        spl.append(t_split)
        okc.append(ok)
    n = zero
    s0 = zero - 1
    s1 = zero - 1
    seen = []
    for i2 in range(2 * K):
        dup = zero
        for j2, okj in seen:
            dup = jnp.maximum(dup, okj * m(spl[j2] == spl[i2]))
        take = okc[i2] * (1 - dup)
        s0 = s0 * (1 - take * m(n == 0)) + spl[i2] * (take * m(n == 0))
        s1 = s1 * (1 - take * m(n == 1)) + spl[i2] * (take * m(n == 1))
        n = n + take
        seen.append((i2, okc[i2] * (1 - dup)))
    out_ref[0] = n
    out_ref[1] = s0
    out_ref[2] = s1


def make_composite_tile_fn(cfg: PipelineConfig, interpret: bool = False):
    """Internal/chimera scan for SHORT reads straight from the pass-1
    composite — zero extra upload.

    A read with true_len <= 2E sits CONTIGUOUSLY in the two-half composite
    (head s[:E] + right-aligned tail s[-E:]), so its whole interior is
    already on device when pass 1 dispatches. fn(packed_tm
    [eg.PACK_ROWS, S] u8) -> [3, S] i16 with the tile kernel's (n, s0, s1)
    contract at g0 = 0; reads outside (min_len, 2E] report n = 0 and ride
    the host tile path. The tail alignment shift (2E - n) is applied with
    log-step rolls (9 static slices, no gather); rolled-in wrap rows land
    at j >= tlen and are masked by the kernel."""
    from sicelore_tpu.ops import edgescan as eg

    p = cfg.polyat
    edge = p.window_search_for_polya
    k = p.internal_pat_length
    min_len = 2 * edge + k
    E, E2 = eg.E, 2 * eg.E
    kfn = make_tile_scan_kernel(cfg, interpret)

    def fn(packed_tm):
        S = packed_tm.shape[1]
        b = packed_tm[:eg.TEXT_ROWS].astype(jnp.int32)
        lenb = packed_tm[eg.TEXT_ROWS:eg.TEXT_ROWS + 4].astype(jnp.int32)
        L = lenb[0] | (lenb[1] << 8) | (lenb[2] << 16) | (lenb[3] << 24)
        # composite bytes pack big-endian pairs (c0<<6|c1<<4|c2<<2|c3)
        codes = jnp.stack(
            [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3],
            axis=1).reshape(E2, S)
        head, tail = codes[:E], codes[E:]
        sh = jnp.clip(E2 - L, 0, E)                     # tail shift
        for bit in range(9):                            # shifts <= 304
            step = 1 << bit
            rolled = jnp.concatenate([tail[step:], tail[:step]], axis=0)
            tail = jnp.where(((sh >> bit) & 1)[None, :] != 0, rolled, tail)
        tile = jnp.concatenate(
            [head, tail, jnp.full((TILE - E2, S), 3, codes.dtype)], axis=0)
        short = (L > min_len) & (L <= E2)
        tlen = jnp.where(short, L, 0)
        own_lo = jnp.where(short, edge, 0)
        own_hi = jnp.where(short, jnp.maximum(L - edge - k + 1, 0), 0)
        # tile-kernel little-endian 2-bit rows + 16 meta byte rows
        packed = (tile[0::4] | (tile[1::4] << 2) | (tile[2::4] << 4)
                  | (tile[3::4] << 6)).astype(jnp.uint8)
        z = jnp.zeros((S,), jnp.int32)
        meta = jnp.stack([
            own_lo & 0xFF, own_lo >> 8, own_hi & 0xFF, own_hi >> 8,
            tlen & 0xFF, tlen >> 8, z, z,
            z, z, z, z,                                  # g0 = 0
            L & 0xFF, (L >> 8) & 0xFF, (L >> 16) & 0xFF, L >> 24,
        ], axis=0).astype(jnp.uint8)
        return kfn(jnp.concatenate([packed, meta], axis=0))

    return fn


def make_tile_scan_kernel(cfg: PipelineConfig, interpret: bool = False):
    """fn(rows_tm [PACK_ROWS, T] u8) -> [3, T] i32 (n, split0, split1 per
    tile row); T a multiple of 1024. Same contract as lax.map over the jnp
    inner, transposed."""
    p = cfg.polyat
    k = p.internal_pat_length
    mc = scanops.min_count_for(k, p.internal_fraction_at_in_polyat)
    m_adc = len(cfg.adapter3p.sequence_complete)
    edmax = cfg.adapter3p.max_complete_seq_needleman_mismatches
    from sicelore_tpu.models.readscan import (K_TILE_SITES, WI_CONFIRM)
    from sicelore_tpu.ops import editdist
    peq = editdist.build_peq(
        dna.encode(cfg.adapter3p.sequence_complete)[None, :])
    peq1 = jnp.asarray(peq[:, 0].astype(np.int32).reshape(1, 4))
    kernel = functools.partial(_tile_kernel, k=k, mc=mc, m_adc=m_adc,
                               edmax=edmax, Wi=WI_CONFIRM, K=K_TILE_SITES)

    def fn(rows_tm):
        R, T = rows_tm.shape
        assert R == PACK_ROWS and T % 1024 == 0
        p3 = rows_tm.reshape(PACK_ROWS, T // 128, 128)
        out = pl.pallas_call(
            kernel,
            grid=(T // 1024,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((PACK_ROWS, 8, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, T // 128, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((TILE, 8, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=T * TILE * 150, transcendentals=0,
                bytes_accessed=T * PACK_ROWS),
            interpret=interpret,
        )(peq1, p3)
        # int16 download: splits are tile-local (< TILE + slack) and the
        # d2h link is the scarce resource
        return out.reshape(3, T).astype(jnp.int16)

    return fn if interpret else jax.jit(fn)
