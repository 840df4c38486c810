"""Fused read-scan forward step — the framework's flagship device "model".

One jitted function per length bucket turns a padded read batch into all
per-read scan results needed by the scanfastq pipeline (reference jar
WorkerReadscanner / PolyATSearcher / AdapterTSOanalyzer behavior, spec at
/root/reference/Jar/config.xml:93-184 and README.md:88-110,396-459):

  * strand call: polyA near the 3' end (FWD) vs polyT near the 5' start (REV)
  * adapter search downstream of the polyA/T, with the window
    reverse-complemented for FWD so the adapter + barcode always appear in
    sense orientation — one geometry for both strands
  * barcode search window extraction (sense orientation, +/- pad)
  * TSO search in the stranded 5' window
  * internal polyA/T sites (chimera-split candidates, up to K per read)
  * mean read QV

Coordinates returned are in the STRANDED read (reference convention: PS =
first A after cDNA, PE = last A of polyA, AE = last adapter base before the
cell BC; /root/reference/Jar/config.xml:40-53). For REV reads the stranded
read is revcomp(original); positions map via p -> len-1-p.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sicelore_tpu.ops import editdist, scan
from sicelore_tpu.utils import dna
from sicelore_tpu.utils.config import PipelineConfig

BIG = 10**9


def gather_window(seqs: jax.Array, lens: jax.Array, starts: jax.Array, W: int,
                  rc: bool = False) -> jax.Array:
    """Extract per-row windows seqs[b, starts[b] : starts[b]+W].

    Out-of-read positions (idx < 0 or >= lens[b]) become PAD. With rc=True the
    window is reverse-complemented (in code space) after extraction.
    """
    B, L = seqs.shape
    idx = starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = (idx >= 0) & (idx < lens[:, None])
    w = jnp.take_along_axis(seqs, jnp.clip(idx, 0, L - 1).astype(jnp.int32), axis=1)
    w = jnp.where(valid, w, jnp.int8(dna.PAD))
    if rc:
        comp = jnp.asarray(dna._COMP, dtype=jnp.int8)
        w = comp[w][:, ::-1]
    return w


def _mean_qv(quals: jax.Array, lens: jax.Array) -> jax.Array:
    """Mean phred over the true read length. quals [B, L] int8."""
    B, L = quals.shape
    cols = jnp.arange(L, dtype=jnp.int32)[None, :]
    m = cols < lens[:, None]
    s = jnp.sum(jnp.where(m, quals.astype(jnp.float32), 0.0), axis=1)
    return s / jnp.maximum(lens.astype(jnp.float32), 1.0)


def _window_mean_qv(quals: jax.Array, lens: jax.Array, starts: jax.Array,
                    ends: jax.Array) -> jax.Array:
    """Mean phred over [starts, ends] inclusive, clipped to the read."""
    B, L = quals.shape
    cols = jnp.arange(L, dtype=jnp.int32)[None, :]
    m = (cols >= starts[:, None]) & (cols <= ends[:, None]) & (cols < lens[:, None])
    s = jnp.sum(jnp.where(m, quals.astype(jnp.float32), 0.0), axis=1)
    n = jnp.sum(m, axis=1)
    return s / jnp.maximum(n.astype(jnp.float32), 1.0)


@functools.partial(jax.jit, static_argnames=("k", "max_sites", "edge"))
def internal_sites(seqs: jax.Array, lens: jax.Array, *, base: int, k: int,
                   min_count: int, edge: int, max_sites: int = 4):
    """Up to `max_sites` disjoint internal polyA/T runs (chimera candidates).

    Returns (count [B] int32, starts [B, max_sites] int32 window-start
    positions, -1 padded). Runs closer than k to a previous site are masked.
    Reference: ChimeraFindernew internal pA/pT search,
    config.xml:97-105 (internalpATlength/internalFractionATInPolyAT).
    """
    B, L = seqs.shape
    if L < k:
        return (jnp.zeros((B,), jnp.int32),
                jnp.full((B, max_sites), -1, jnp.int32))
    ind = (seqs == base).astype(jnp.int32)
    counts = scan._rolling_count(ind, k)
    npos = L - k + 1
    pos = jnp.arange(npos, dtype=jnp.int32)[None, :]
    inread = pos <= (lens[:, None] - k)
    internal = (pos >= edge) & ((pos + k - 1) < (lens[:, None] - edge))
    ok = (counts >= min_count) & inread & internal

    starts = []
    for _ in range(max_sites):
        j = jnp.min(jnp.where(ok, pos, BIG), axis=1)  # first passing window
        found = j < BIG
        starts.append(jnp.where(found, j, -1).astype(jnp.int32))
        # mask this run: all passing windows within k of j (same run) plus the
        # contiguous passing stretch starting at j
        # conservative: mask windows in [j, j + 2k)
        mask = (pos >= j[:, None]) & (pos < (j[:, None] + 2 * k))
        ok = ok & ~mask
    st = jnp.stack(starts, axis=1)
    return jnp.sum(st >= 0, axis=1).astype(jnp.int32), st


def make_scan_fn(cfg: PipelineConfig):
    """Build the jitted scan forward function for config `cfg`.

    Returns scan_fn(seqs, quals, lens, peq_ad, peq_adc, peq_tso) -> dict.
    peq_* are [4, 1] uint32 single-pattern bitmasks (adapter short form,
    adapter complete, TSO) in SENSE orientation.
    """
    p = cfg.polyat
    a = cfg.adapter3p
    t = cfg.tso3p
    bc_len = cfg.barcodes.cell_bc_length
    pad = cfg.readscanner.test_plus_minus_pos
    k = p.polyat_length
    min_count = scan.min_count_for(k, p.fraction_at_in_polyat)
    awin = a.adapter_search_window
    twin = t.window_for_tso_search
    m_ad = len(a.sequence)
    m_adc = len(a.sequence_complete)
    m_tso = len(t.sequence)
    bc_win = bc_len + 2 * pad + 2  # slack for deletions in the adapter match
    nbases = cfg.readscanner.nbases_of_adapter_seq_in_readname
    x_len = 40 + nbases  # X= spans [AE-40, AE+nbases-1] (README example: 43)

    @jax.jit
    def scan_fn(seqs, quals, lens, peq_ad, peq_adc, peq_tso):
        B, L = seqs.shape

        # ---- polyA (3' end, FWD hypothesis) / polyT (5' start, REV) ----
        fwd_found, fwd_ps, fwd_pe = scan.polyat_find(
            seqs, lens, base=dna.A, k=k, min_count=min_count,
            window=p.window_search_for_polya, from_end=True)
        rev_found, rev_ts, rev_te = scan.polyat_find(
            seqs, lens, base=dna.T, k=k, min_count=min_count,
            window=p.window_search_for_polya, from_end=False)

        # ---- adapter search, unified sense-orientation window ----
        # FWD: rc window after polyA end -> [rc(tail) adapter BC UMI]
        w_fwd = gather_window(seqs, lens, fwd_pe + 1, awin, rc=True)
        # REV: window before polyT start -> [head adapter BC UMI]
        w_rev = gather_window(seqs, lens, rev_ts - awin, awin, rc=False)
        ed_f, pos_f = scan.adapter_search(w_fwd, peq_ad, m_ad)
        ed_r, pos_r = scan.adapter_search(w_rev, peq_ad, m_ad)
        ed_f = jnp.where(fwd_found, ed_f, BIG)
        ed_r = jnp.where(rev_found, ed_r, BIG)

        # strand choice: hypothesis whose adapter matched within budget wins;
        # both pass -> lower adapter ED, tie -> FWD (policy; jar internals
        # are unobservable, see module docstring)
        ok_f = fwd_found & (ed_f <= a.max_needleman_mismatches)
        ok_r = rev_found & (ed_r <= a.max_needleman_mismatches)
        is_fwd = ok_f & (~ok_r | (ed_f <= ed_r))
        stranded = ok_f | ok_r
        # fallback orientation for unstranded reads with only polyA/T evidence
        is_fwd = jnp.where(stranded, is_fwd, fwd_found)

        # stranded-coordinate results
        ps = jnp.where(is_fwd, fwd_ps, lens - 1 - rev_te)
        pe = jnp.where(is_fwd, fwd_pe, lens - 1 - rev_ts)
        has_pat = jnp.where(is_fwd, fwd_found, rev_found)
        ps = jnp.where(has_pat, ps, -1)
        pe = jnp.where(has_pat, pe, -1)

        # AE: last adapter base before the BC, stranded coords.
        # FWD window w' maps w'[i] <- read[pe + awin - i]; adapter match end
        # at i_e -> AE = pe + awin - i_e (first rcAdapter base in read).
        # REV window starts at rev_ts - awin in original coords; stranded
        # pos of orig q is len-1-q -> AE = len-1-(rev_ts-awin+i_e).
        ae = jnp.where(is_fwd, fwd_pe + awin - pos_f,
                       lens - 1 - (rev_ts - awin + pos_r))
        ad_ed = jnp.where(is_fwd, ed_f, ed_r)
        ad_pos_local = jnp.where(is_fwd, pos_f, pos_r)
        ae = jnp.where(stranded, ae, -1)

        # complete-adapter ED in the same window (pass-1 stringency + stats)
        w_used = jnp.where(is_fwd[:, None], w_fwd, w_rev)
        edc, _ = scan.adapter_search(w_used, peq_adc, m_adc)

        # consecutive-match runs of the complete adapter (pass-1 filter:
        # minAdapter3pMatches consecutive matches, config.xml:60-61)
        ad_runs, _ = scan.match_run_stats(
            w_used, jnp.asarray(dna.encode(a.sequence_complete)), m_adc)

        # ---- BC window (sense orientation) right after the adapter end ----
        # in-window the BC starts at ad_pos_local+1; extract with +/- pad
        bc_start_local = ad_pos_local + 1 - pad
        bc_windows = gather_window(w_used, jnp.full((B,), awin, jnp.int32),
                                   bc_start_local, bc_win, rc=False)

        # ---- TSO in the stranded 5' window ----
        w5_f = gather_window(seqs, lens, jnp.zeros((B,), jnp.int32), twin)
        w5_r = gather_window(seqs, lens, lens - twin, twin, rc=True)
        w5 = jnp.where(is_fwd[:, None], w5_f, w5_r)
        tso_ed, tso_pos = scan.adapter_search(w5, peq_tso, m_tso)
        tso_found = tso_ed <= t.max_needleman_mismatches
        tso_end = jnp.where(tso_found, tso_pos + (t.offset_tso_end - 1), -1)

        # ---- internal polyA/T sites (chimera candidates) ----
        mc_int = scan.min_count_for(p.internal_pat_length,
                                    p.internal_fraction_at_in_polyat)
        nA, sA = internal_sites(seqs, lens, base=dna.A,
                                k=p.internal_pat_length, min_count=mc_int,
                                edge=p.window_search_for_polya)
        nT, sT = internal_sites(seqs, lens, base=dna.T,
                                k=p.internal_pat_length, min_count=mc_int,
                                edge=p.window_search_for_polya)

        # ---- QVs ----
        read_qv = _mean_qv(quals, lens)
        # X region: stranded [ae - x_len + nbases, ae + nbases - 1];
        # original coords for FWD == stranded; for REV mirror.
        xs_str = ae - (x_len - nbases)
        xe_str = ae + nbases - 1
        xs = jnp.where(is_fwd, xs_str, lens - 1 - xe_str)
        xe = jnp.where(is_fwd, xe_str, lens - 1 - xs_str)
        x_qv = _window_mean_qv(quals, lens, jnp.maximum(xs, 0), xe)
        # BC-region mean QV (stranded [ae-bc_len, ae-1] -> orig coords)
        bs = jnp.where(is_fwd, ae - bc_len, lens - 1 - (ae - 1))
        be = jnp.where(is_fwd, ae - 1, lens - 1 - (ae - bc_len))
        bc_qv = _window_mean_qv(quals, lens, jnp.maximum(bs, 0), be)

        return {
            "is_fwd": is_fwd, "stranded": stranded, "has_polyat": has_pat,
            "ps": ps, "pe": pe, "ae": ae,
            "adapter_ed": jnp.where(stranded, ad_ed, BIG),
            "adapter_complete_ed": edc,
            "adapter_run": ad_runs,
            "bc_windows": bc_windows,
            "tso_end": tso_end, "tso_ed": tso_ed,
            "n_internal_a": nA, "internal_a": sA,
            "n_internal_t": nT, "internal_t": sT,
            "read_qv": read_qv, "x_qv": x_qv, "bc_qv": bc_qv,
            "x_start": xs_str, "x_end": xe_str,
        }

    return scan_fn


class ReadScanModel:
    """Host-side wrapper: owns pattern bitmasks + per-bucket-length jit cache."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        a, t = self.cfg.adapter3p, self.cfg.tso3p
        self.peq_ad = jnp.asarray(editdist.build_peq(dna.encode(a.sequence)[None, :]))
        self.peq_adc = jnp.asarray(
            editdist.build_peq(dna.encode(a.sequence_complete)[None, :]))
        self.peq_tso = jnp.asarray(editdist.build_peq(dna.encode(t.sequence)[None, :]))
        self._fn = make_scan_fn(self.cfg)

    @property
    def bc_window_width(self) -> int:
        return (self.cfg.barcodes.cell_bc_length
                + 2 * self.cfg.readscanner.test_plus_minus_pos + 2)

    def __call__(self, seqs, quals, lens):
        """seqs/quals [B, L] int8 (codes / phred), lens [B] int32 -> dict of
        np.ndarray per-read results (see make_scan_fn)."""
        out = self._fn(jnp.asarray(seqs), jnp.asarray(quals),
                       jnp.asarray(lens, dtype=jnp.int32),
                       self.peq_ad, self.peq_adc, self.peq_tso)
        return {k: np.asarray(v) for k, v in out.items()}


def bucket_length(n: int, minimum: int = 256) -> int:
    """Round a read length up to the next power-of-two bucket."""
    b = minimum
    while b < n:
        b *= 2
    return b
