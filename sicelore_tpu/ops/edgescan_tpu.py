"""Pallas TPU kernel for the two-half text-major edge scan (3p chemistry).

One kernel instance processes a tile of 1024 reads laid out on (sublane,
lane) = [8, 128]; every per-read variable is one [8, 128] i32 vector, every
text column access is one row of a [2E, 8, 128] VMEM scratch, so each
operation is a fully-utilized VPU op. The phases:

  0. unpack the 2-bit text-major composite into the column scratch
  A. polyA/T run detection — sliding k-window counts + run tracking over
     both halves in one fused column loop (head polyT forward, tail polyA)
  B. run tightening (first/last base inside the detected segment)
  C. SENSE column sweep over the head band: REV-hypothesis adapter short +
     complete Myers states with per-read in-window eq masking, the
     complete-adapter consecutive-match run detector, and the FWD TSO state
  D. RC column sweep over the tail band (descending columns, complemented
     eq select): FWD adapter short/complete + run detector, REV TSO
  E. strand choice + coordinate outputs (register ops)
  F. BC window extraction by conditional log-shift rolls over 256-row
     slices of each half, + 2-bit kmer packing

In-window eq masking is exactly equivalent to the gathered-window searches
of the jnp body: a free-text-start Myers state is invariant under eq=0
columns (D[i]=i stays D[i]=i), and the score at the pattern row cannot
improve on an eq=0 column, so masking eq to the window and tracking the
best only at in-window columns reproduces gather+search bit for bit
(asserted against the jnp body in tests/test_edgescan2.py).

Reference behavior: /root/reference/Jar/config.xml:93-184, README.md:88-110.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sicelore_tpu.ops import edgescan as eg
from sicelore_tpu.ops import scan as scanops
from sicelore_tpu.utils import dna
from sicelore_tpu.utils.config import PipelineConfig

E = eg.E
U = 16            # unrolled columns per fori iteration (~1.3 us/iter tax)
BIGC = 1 << 28


def _supported(cfg: PipelineConfig) -> bool:
    p = cfg.polyat
    a, t = cfg.adapter3p, cfg.tso3p
    k = p.polyat_length
    mc = scanops.min_count_for(k, p.fraction_at_in_polyat)
    return (getattr(cfg, "chemistry", "3p") == "3p"
            and 2 <= k <= 16 and 1 <= mc <= k
            and p.window_search_for_polya + k <= E - 8
            and len(a.sequence) <= 31 and len(a.sequence_complete) <= 31
            and len(t.sequence) <= 31
            and a.adapter_search_window <= 128
            and t.window_for_tso_search <= 160
            and 2 <= cfg.readscanner.min_adapter3p_matches
            <= min(16, len(a.sequence_complete))
            and 2 <= t.min_tso_consecutive_matches <= 16
            and t.min_tso_two_best_consecutive_matches
            >= t.min_tso_consecutive_matches
            and eg.bc_window_width(cfg) <= 32)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bail_pairs(c1: int, c2: int):
    """Ordered (now, before) threshold pairs of the two-best bailout
    decomposition (see ops.scan.run_bailout)."""
    pairs = []
    for a in range((c2 + 1) // 2, min(c1, c2)):
        b = c2 - a
        if b < 1:
            continue
        for xy in {(a, b), (b, a)}:
            pairs.append(xy)
    return tuple(sorted(pairs))


def _edge_kernel(peq_ref, packed_ref, out_ref, T, *, cfg_c: dict):
    k = cfg_c["k"]; mc = cfg_c["mc"]; win_p = cfg_c["win_p"]
    awin = cfg_c["awin"]; twin = cfg_c["twin"]
    m_ad = cfg_c["m_ad"]; m_adc = cfg_c["m_adc"]; m_tso = cfg_c["m_tso"]
    mm_ad = cfg_c["mm_ad"]; mm_tso = cfg_c["mm_tso"]
    off_tso = cfg_c["off_tso"]; r_run = cfg_c["r_run"]
    tso_c1 = cfg_c["tso_c1"]; tso_pairs = cfg_c["tso_pairs"]
    tso_ys = sorted({y for _, y in tso_pairs})
    tso_maxx = max([x for x, _ in tso_pairs], default=1)
    pad = cfg_c["pad"]; bc_len = cfg_c["bc_len"]; bw = cfg_c["bw"]
    x_len = cfg_c["x_len"]; nb = cfg_c["nb"]
    CS = cfg_c["CS"]          # sense/rc sweep columns (multiple of U)
    PH = cfg_c.get("stop_after", 9)   # phase-cost bisection (debug only)

    shp = (8, 128)
    zero = jnp.zeros(shp, jnp.int32)
    one = zero + 1

    def m(c):
        return jnp.where(c, one, zero)

    # ---- lens ----
    lb = [packed_ref[eg.TEXT_ROWS + i].astype(jnp.int32) for i in range(4)]
    L = lb[0] | (lb[1] << 8) | (lb[2] << 16) | (lb[3] << 24)
    hl = jnp.minimum(L, E)
    ts0 = E - hl                       # first in-read tail column
    tshift = L - E                     # tail col -> true coordinate

    # ---- phase 0: unpack 2-bit rows into the column scratch ----
    # STATIC offsets + one block store per 8 packed rows: a dynamic
    # single-row scratch store costs ~4 us on this target (measured — the
    # original per-row unpack was 80 ms/32k reads on its own)
    for blk in range(eg.TEXT_ROWS // 8):
        rows = packed_ref[blk * 8:blk * 8 + 8]        # [8, 8, 128] u8
        vals = []
        for q in range(8):
            b = rows[q].astype(jnp.int32)
            for sh in (6, 4, 2, 0):
                vals.append((b >> sh) & 3)
        T[blk * 32:blk * 32 + 32] = jnp.stack(vals, axis=0)
    if PH < 1:
        for i in range(out_ref.shape[0]):
            out_ref[i] = L
        return

    # ---- phase A: polyT (head, forward) + polyA (tail) run bounds ----
    # STATIC column loop: static scratch slices, and region predicates on
    # the static column index skip whole update groups at trace time (the
    # REV candidate region is only the first win_p columns, the FWD region
    # only the last win_p + k).
    fwd_reg0 = E - win_p - k + 1       # tail region: run end in last win_p
    cT = fT = jT = cgT = reT = zero
    cA = ppA = csA = fjA = fsA = fA = zero
    for blk in range(E // U):
        j0 = blk * U
        rows_h = T[j0:j0 + U]
        rows_t = T[E + j0:E + j0 + U]
        lag_h = T[max(j0 - U, 0):max(j0 - U, 0) + U]
        lag_t = T[E + max(j0 - U, 0):E + max(j0 - U, 0) + U]
        for u in range(U):
            j = j0 + u
            p = j - (k - 1)
            jv = zero + j
            # --- head polyT (candidate windows only below win_p; the run
            # walk continues over `passing` beyond it) ---
            iT = m(rows_h[u] == dna.T) * m(jv < hl)
            if j >= k:
                lagTm = (m(lag_h[u + U - k] == dna.T) if u < k
                         else m(rows_h[u - k] == dna.T))
                cT = cT + iT - lagTm * m(jv - k < hl)
            else:
                cT = cT + iT
            if p >= 0:
                passT = m(cT >= mc) * m(p <= hl - k)
                if p < win_p:
                    newf = passT * (1 - fT)
                    jT = jT * (1 - newf) + p * newf
                else:
                    newf = zero
                upd = newf + fT * cgT * passT
                reT = reT * (1 - upd) + p * upd
                cgT = newf + fT * cgT * passT
                fT = jnp.maximum(fT, newf)
            # --- tail polyA ---
            iA = m(rows_t[u] == dna.A) * m(jv >= ts0)
            if j >= k:
                lagAm = (m(lag_t[u + U - k] == dna.A) if u < k
                         else m(rows_t[u - k] == dna.A))
                cA = cA + iA - lagAm * m(jv - k >= ts0)
            else:
                cA = cA + iA
            if p >= 0:
                passA = m(cA >= mc) * m(p >= ts0)
                newrun = passA * (1 - ppA)
                csA = csA * (1 - newrun) + p * newrun
                ppA = passA
                if p >= fwd_reg0:
                    hit = passA
                    fjA = fjA * (1 - hit) + p * hit
                    fsA = fsA * (1 - hit) + csA * hit
                    fA = jnp.maximum(fA, hit)

    teT = jnp.minimum(reT + (k - 1), hl - 1)     # head segment end
    seA = fjA + (k - 1)                          # tail segment end (<= E-1)
    if PH < 2:
        for i in range(out_ref.shape[0]):
            out_ref[i] = jT + fjA
        return

    # ---- phase B: tighten to first/last base inside the segments ----
    f1T = f1A = zero + BIGC
    l1T = l1A = zero - 1
    for blk in range(E // U):
        j0 = blk * U
        rows_h = T[j0:j0 + U]
        rows_t = T[E + j0:E + j0 + U]
        for u in range(U):
            jv = zero + (j0 + u)
            cT_ = m(rows_h[u] == dna.T) * m(jv >= jT) * m(jv <= teT) * fT
            f1T = jnp.minimum(f1T, jv * cT_ + BIGC * (1 - cT_))
            l1T = jnp.maximum(l1T, jv * cT_ - (1 - cT_))
            cA_ = (m(rows_t[u] == dna.A) * m(jv >= fsA) * m(jv <= seA)
                   * m(jv >= ts0) * fA)
            f1A = jnp.minimum(f1A, jv * cA_ + BIGC * (1 - cA_))
            l1A = jnp.maximum(l1A, jv * cA_ - (1 - cA_))

    rev_found = fT * m(l1T >= 0)
    fwd_found = fA * m(l1A >= 0)
    rev_ts = rev_found * f1T - (1 - rev_found)   # -1 when not found
    rev_te = rev_found * l1T - (1 - rev_found)
    fwd_ps = fwd_found * f1A - (1 - fwd_found)
    fwd_pe = fwd_found * l1A - (1 - fwd_found)
    if PH < 3:
        for i in range(out_ref.shape[0]):
            out_ref[i] = rev_ts + fwd_pe
        return

    # ---- Myers helpers ----
    def peqs(pi):
        return [zero.astype(jnp.uint32) + jnp.uint32(peq_ref[pi, c])
                for c in range(4)]

    pq_ad, pq_adc, pq_tso = peqs(0), peqs(1), peqs(2)

    def mstate(mlen):
        full = jnp.uint32((1 << mlen) - 1)
        return (zero.astype(jnp.uint32) + full, zero.astype(jnp.uint32),
                zero + mlen, zero + mlen, zero - 1)

    def mstep(st, eq, jv, mlen, track=True):
        PV, MV, sc, best, bpos = st
        hibit = jnp.uint32(mlen - 1)
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
        if track:
            imp = sc < best
            bpos = jnp.where(imp, jv, bpos)
            best = jnp.minimum(sc, best)
        else:
            best = jnp.minimum(sc, best)
        return (PV, MV, sc, best, bpos)

    def eq_sel(ch, pq, win):
        w32 = win.astype(jnp.uint32)
        return ((m(ch == 0).astype(jnp.uint32) * pq[0]
                 | m(ch == 1).astype(jnp.uint32) * pq[1]
                 | m(ch == 2).astype(jnp.uint32) * pq[2]
                 | m(ch == 3).astype(jnp.uint32) * pq[3]) * w32)

    # TSO consecutive-match bailout tracker (ops.scan.run_bailout online
    # formulation): a V-chain of depth tso_c1 plus delayed end-history
    # registers per pair threshold
    def bail_init():
        return ([zero.astype(jnp.uint32)] * tso_c1,
                {y: zero for y in tso_ys},
                {y: [zero] * tso_maxx for y in tso_ys}, zero)

    def bail_step(st, eq_t):
        Vt, Ey, hist, bail = st
        Vn = [eq_t]
        for l in range(1, tso_c1):
            Vn.append(eq_t & (Vt[l - 1] << jnp.uint32(1)))
        for x, y in tso_pairs:
            bail = jnp.maximum(bail, m(Vn[x - 1] != 0) * hist[y][-x])
        bail = jnp.maximum(bail, m(Vn[tso_c1 - 1] != 0))
        Ey2, hist2 = {}, {}
        for y in tso_ys:
            e = jnp.maximum(Ey[y], m(Vn[y - 1] != 0))
            Ey2[y] = e
            hist2[y] = (hist[y] + [e])[-tso_maxx:]
        return (Vn, Ey2, hist2, bail)

    # ---- phase C: sense sweep over the head band (static columns) ----
    adR_lo = rev_ts - awin
    adR = mstate(m_ad)
    adcR = mstate(m_adc)
    tsoF = mstate(m_tso)
    runR = zero
    bstF = bail_init()
    V = [zero.astype(jnp.uint32)] * r_run
    for blk in range(CS // U):
        j0 = blk * U
        rows = T[j0:j0 + U]
        for u in range(U):
            j = j0 + u
            jv = zero + j
            ch = rows[u]
            inread = m(jv < hl)
            w_ad = m(jv >= adR_lo) * m(jv < rev_ts) * inread
            adR = mstep(adR, eq_sel(ch, pq_ad, w_ad), jv, m_ad)
            eqc = eq_sel(ch, pq_adc, w_ad)
            adcR = mstep(adcR, eqc, jv, m_adc, track=False)
            if j < twin:
                w_t = m(jv < twin) * inread
                eq_t = eq_sel(ch, pq_tso, w_t)
                tsoF = mstep(tsoF, eq_t, jv, m_tso)
                bstF = bail_step(bstF, eq_t)
            Vn = [eqc]
            for l in range(1, r_run):
                Vn.append(eqc & (V[l - 1] << jnp.uint32(1)))
            V = Vn
            runR = jnp.maximum(runR, m(V[r_run - 1] != 0))
    bailF = bstF[3]
    if PH < 4:
        for i in range(out_ref.shape[0]):
            out_ref[i] = adR[3] + adcR[3] + tsoF[3] + runR
        return

    # ---- phase D: rc sweep over the tail band (static columns) ----
    adF_lo = (E - 1) - fwd_pe - awin
    adF_hi = (E - 1) - fwd_pe
    adF = mstate(m_ad)
    adcF = mstate(m_adc)
    tsoR = mstate(m_tso)
    runF = zero
    bstR = bail_init()
    V = [zero.astype(jnp.uint32)] * r_run
    for blk in range(CS // U):
        r0 = blk * U
        rows = T[2 * E - r0 - U:2 * E - r0]      # row u <-> r = r0 + U-1-u
        for u in range(U - 1, -1, -1):
            r = r0 + (U - 1 - u)
            rv = zero + r
            ch = rows[u]                          # tail col c = E-1-r
            valid = m((zero + (E - 1 - r)) >= ts0)
            w_ad = m(rv >= adF_lo) * m(rv < adF_hi) * valid

            # complemented eq select: comp(ch) == b  <=>  ch == 3-b
            def ceq(pq, w):
                return ((m(ch == 3).astype(jnp.uint32) * pq[0]
                         | m(ch == 2).astype(jnp.uint32) * pq[1]
                         | m(ch == 1).astype(jnp.uint32) * pq[2]
                         | m(ch == 0).astype(jnp.uint32) * pq[3])
                        * w.astype(jnp.uint32))

            adF = mstep(adF, ceq(pq_ad, w_ad), rv, m_ad)
            eqc = ceq(pq_adc, w_ad)
            adcF = mstep(adcF, eqc, rv, m_adc, track=False)
            if r < twin:
                w_t = m(rv < twin) * valid
                eq_t = ceq(pq_tso, w_t)
                tsoR = mstep(tsoR, eq_t, rv, m_tso)
                bstR = bail_step(bstR, eq_t)
            Vn = [eqc]
            for l in range(1, r_run):
                Vn.append(eqc & (V[l - 1] << jnp.uint32(1)))
            V = Vn
            runF = jnp.maximum(runF, m(V[r_run - 1] != 0))
    bailR = bstR[3]
    if PH < 5:
        for i in range(out_ref.shape[0]):
            out_ref[i] = adF[3] + adcF[3] + tsoR[3] + runF
        return

    # ---- phase E: strand choice + outputs ----
    ed_f = fwd_found * adF[3] + (1 - fwd_found) * eg.BIG
    ed_r = rev_found * adR[3] + (1 - rev_found) * eg.BIG
    pos_f = jnp.where(adF[4] >= 0, adF[4] - adF_lo, zero - 1)
    pos_r = jnp.where(adR[4] >= 0, adR[4] - adR_lo, zero - 1)
    ok_f = fwd_found * m(ed_f <= mm_ad)
    ok_r = rev_found * m(ed_r <= mm_ad)
    is_fwd = ok_f * jnp.maximum(1 - ok_r, m(ed_f <= ed_r))
    stranded = jnp.maximum(ok_f, ok_r)
    is_fwd = stranded * is_fwd + (1 - stranded) * fwd_found

    # half-local coordinate rows: FWD -> tail columns, REV -> head columns
    # (the host maps to stranded coords; see edgescan.finalize_meta_np)
    has_pat = is_fwd * fwd_found + (1 - is_fwd) * rev_found
    ps_loc = is_fwd * fwd_ps + (1 - is_fwd) * rev_te
    pe_loc = is_fwd * fwd_pe + (1 - is_fwd) * rev_ts
    ae_loc = (is_fwd * (fwd_pe + awin - pos_f)
              + (1 - is_fwd) * (rev_ts - awin + pos_r))
    ad_ed = is_fwd * ed_f + (1 - is_fwd) * ed_r
    ad_pos = is_fwd * pos_f + (1 - is_fwd) * pos_r
    edc = is_fwd * adcF[3] + (1 - is_fwd) * adcR[3]
    run_ok = is_fwd * runF + (1 - is_fwd) * runR
    tso_ed = is_fwd * tsoF[3] + (1 - is_fwd) * tsoR[3]
    tso_pos = is_fwd * tsoF[4] + (1 - is_fwd) * tsoR[4]
    tso_bail = is_fwd * bailF + (1 - is_fwd) * bailR
    tso_fnd = jnp.maximum(m(tso_ed <= mm_tso), tso_bail)
    tso_end = tso_fnd * (tso_pos + (off_tso - 1)) - (1 - tso_fnd)

    if PH < 6:
        for i in range(out_ref.shape[0]):
            out_ref[i] = ae_loc + tso_end + ps_loc + pe_loc
        return
    # ---- phase F: BC window extraction (log-shift rolls, 256-row bands) --
    bcs = ad_pos + 1 - pad
    s_rev = adR_lo + bcs                 # head col of REV window start
    qe = fwd_pe + awin - bcs             # highest tail col of FWD window
    s_fwd = qe - (bw - 1) - (E - 256)    # local start in the tail band

    def extract(H, s):
        sm = s & 255
        for b in range(8):
            sh = 1 << b
            rolled = jnp.concatenate([H[sh:], H[:sh]], axis=0)
            bit = m(((sm >> b) & 1) == 1)[None]
            H = bit * rolled + (1 - bit) * H
        return H

    H1 = extract(T[0:256], s_rev)
    H2 = extract(T[2 * E - 256:2 * E], s_fwd)
    padv = zero + dna.PAD
    bc_rows = []
    for i in range(bw):
        wi = bcs + i
        q1 = s_rev + i
        ok1 = m(wi >= 0) * m(wi < awin) * m(q1 >= 0) * m(q1 < hl)
        v1 = ok1 * H1[i] + (1 - ok1) * padv
        q2 = qe - i
        ok2 = (m(wi >= 0) * m(wi < awin) * m(q2 >= ts0) * m(q2 <= E - 1)
               * fwd_found)
        x = bw - 1 - i
        v2 = ok2 * (3 - H2[x]) + (1 - ok2) * padv
        bc_rows.append(is_fwd * v2 + (1 - is_fwd) * v1)

    kmer = zero.astype(jnp.uint32)
    kvalid = one
    for i in range(bc_len):
        c = bc_rows[pad + i]
        kvalid = kvalid * m(c < 4)
        kmer = (kmer << jnp.uint32(2)) | jnp.minimum(c, 3).astype(jnp.uint32)

    out_ref[eg.ROW_IS_FWD] = is_fwd
    out_ref[eg.ROW_STRANDED] = stranded
    out_ref[eg.ROW_HAS_POLYAT] = has_pat
    out_ref[eg.ROW_PS] = ps_loc
    out_ref[eg.ROW_PE] = pe_loc
    out_ref[eg.ROW_AE] = ae_loc
    out_ref[eg.ROW_AD_ED] = (stranded * jnp.minimum(ad_ed, eg.ED_SENTINEL)
                             + (1 - stranded) * eg.ED_SENTINEL)
    out_ref[eg.ROW_ADC_ED] = edc
    out_ref[eg.ROW_AD_RUN] = run_ok * r_run
    out_ref[eg.ROW_TSO_END] = tso_end
    out_ref[eg.ROW_TSO_ED] = tso_ed
    out_ref[eg.ROW_KMER_LO] = (kmer & jnp.uint32(0xFFFF)).astype(jnp.int32)
    out_ref[eg.ROW_KMER_HI] = (kmer >> jnp.uint32(16)).astype(jnp.int32)
    out_ref[eg.ROW_KMER_VALID] = kvalid
    for i in range(bw):
        out_ref[eg.ROW_BC0 + i] = bc_rows[i]


def make_edge_scan2_kernel(cfg: PipelineConfig, interpret: bool = False):
    """Build the kernel dispatcher: fn(packed_tm [PACK_ROWS, B] u8, peq_ad,
    peq_adc, peq_tso) -> meta [n_rows(cfg), B] i32 — same contract as the
    jnp body (B a multiple of 1024). Falls back to the jnp body for
    configurations outside the kernel's static envelope."""
    if not _supported(cfg):
        body = eg.make_edge_scan2_jnp(cfg)

        def fb(packed_tm, peq_ad, peq_adc, peq_tso):
            head, tail, lens = eg.unpack_tm(packed_tm)
            return body(head, tail, lens, peq_ad, peq_adc, peq_tso)

        return fb

    p = cfg.polyat
    a, t = cfg.adapter3p, cfg.tso3p
    k = p.polyat_length
    mc = scanops.min_count_for(k, p.fraction_at_in_polyat)
    cfg_c = dict(
        k=k, mc=mc, win_p=p.window_search_for_polya,
        awin=a.adapter_search_window, twin=t.window_for_tso_search,
        m_ad=len(a.sequence), m_adc=len(a.sequence_complete),
        m_tso=len(t.sequence),
        mm_ad=a.max_needleman_mismatches,
        mm_tso=t.max_needleman_mismatches,
        off_tso=t.offset_tso_end,
        tso_c1=t.min_tso_consecutive_matches,
        tso_pairs=_bail_pairs(t.min_tso_consecutive_matches,
                              t.min_tso_two_best_consecutive_matches),
        r_run=cfg.readscanner.min_adapter3p_matches,
        pad=cfg.readscanner.test_plus_minus_pos,
        bc_len=cfg.barcodes.cell_bc_length,
        bw=eg.bc_window_width(cfg),
        x_len=40 + cfg.readscanner.nbases_of_adapter_seq_in_readname,
        nb=cfg.readscanner.nbases_of_adapter_seq_in_readname,
        CS=min(_round_up(max(p.window_search_for_polya + k - mc + 2,
                             t.window_for_tso_search), U), E),
    )
    NR = eg.n_rows(cfg)
    kernel = functools.partial(_edge_kernel, cfg_c=cfg_c)

    def fn(packed_tm, peq_ad, peq_adc, peq_tso):
        R, B = packed_tm.shape
        assert R == eg.PACK_ROWS and B % 1024 == 0
        peq3 = jnp.stack([peq_ad[:, 0], peq_adc[:, 0], peq_tso[:, 0]],
                         axis=0).astype(jnp.int32)          # [3, 4]
        p3 = packed_tm.reshape(eg.PACK_ROWS, B // 128, 128)
        out = pl.pallas_call(
            kernel,
            grid=(B // 1024,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((eg.PACK_ROWS, 8, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NR, 8, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NR, B // 128, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((2 * E, 8, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=B * (2 * E * 40 + 2 * cfg_c["CS"] * 90),
                transcendentals=0, bytes_accessed=B * 160),
            interpret=interpret,
        )(peq3, p3)
        return out.reshape(NR, B)

    # interpret mode (CPU parity tests) stays UN-jitted: XLA:CPU cannot
    # compile the fully-unrolled interpreter expansion in reasonable time;
    # eager interpretation runs it op by op instead
    return fn if interpret else jax.jit(fn)
