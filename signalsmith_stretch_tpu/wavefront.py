"""Planned spectral pipeline: all-blocks batched precompute + diagonal sweep.

The offline engine's key structural facts (derived from signalsmith-stretch.h
and exploited here; see SURVEY.md §7):

1. Everything in processSpectrum except the phase recursion is *analysis
   derived*: energies, smoothing, peaks, output map, formant envelopes, the
   pitch-estimate chain, prediction energies — none depend on Band.output.
   With the block schedule static, all of it vectorizes over [blocks, bins]
   with no sequential scan (the only cross-block couplings — prevInput rolls,
   prediction-energy history, freqEstimate smoothing — are closed-form chains
   or tiny associative scans over blocks).

2. The only true recurrent state is Band.output.  The preliminary prediction
   is linear in the previous block's output (out_prelim = C1 * out_prev with a
   precomputable complex coefficient), so the main-prediction vote sum
   (:744-786) becomes

     phase[k,b] = D1*out[k,b-1] + D2*out[k,b-LV]          (new outputs)
                + A1*out[k-1,b+1] + A2*out[k-1,b+LV]      (via prelim)

   with all four complex coefficients precomputed (boundary masks folded in
   as zeros).  Skewing t = b + k*(LV+1) makes every dependency land on
   diagonals t-1 and t-LV, so one lax.scan over B + (nB-1)*(LV+1) diagonals
   replaces nB*B sequential steps — ~200x fewer for the default preset.

Performance notes:
  - Sweep inputs are flat [D, nB] arrays (channels as separate arrays) so
    each scan step works on [batch, nB] tiles with bins in the lane dim.
  - Fractional-bin interpolation takes gather-free paths when possible:
    identity positions when no frequency map is active, and per-block
    uniform-shift (dynamic-slice + lerp) for the vote gathers when no block
    is in the randomized (>2x stretch) regime.

Numerics: identical per-value operation sequences as the per-block engine up
to float reassociation in the coefficient folding (~1e-7, far below the
reference's own chaos bound, docs/PARITY.md).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spectral
from .config import MAX_CLEAN_STRETCH, NOISE_FLOOR
from .ops import scan_ops

f32 = np.float32


# ---------------------------------------------------------------------------
# Skew / unskew via the pad-flatten-reshape trick (no gathers)
# ---------------------------------------------------------------------------
def skew(x: jnp.ndarray, step: int) -> jnp.ndarray:
    """[nB, B, ...] -> [nB, D, ...] with S[k, b + k*step] = x[k, b]."""
    nB, B = x.shape[:2]
    D = B + (nB - 1) * step
    T = D + step
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, T - B)
    xp = jnp.pad(x, pad)
    flat = xp.reshape((nB * T,) + x.shape[2:])
    return flat[:nB * (T - step)].reshape((nB, T - step) + x.shape[2:])


def unskew(s: jnp.ndarray, step: int, bands: int) -> jnp.ndarray:
    """Inverse of skew: [nB, D, ...] -> [nB, bands, ...].

    Flatten at the original pitch D, append nB*step zeros, and re-view at
    pitch D + step: row k column j then reads s[k, j + k*step]."""
    nB, D = s.shape[:2]
    flat = s.reshape((nB * D,) + s.shape[2:])
    tail = jnp.zeros((nB * step,) + s.shape[2:], s.dtype)
    flat = jnp.concatenate([flat, tail], axis=0)
    view = flat.reshape((nB, D + step) + s.shape[2:])
    return view[:, :bands]


# ---------------------------------------------------------------------------
# Fractional-bin interpolation strategies
# ---------------------------------------------------------------------------
def _interp_gather(rows: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """rows [nB, B], pos [nB, B] -> linear interp with zero outside [0, B).

    NOTE (this environment): XLA TPU gathers cost ~14 ns/element regardless of
    index pattern or dtype, which makes the frequency-mapped regime
    gather-bound (~12x realtime ceiling at bench shapes).  Complex-packed and
    MXU one-hot alternatives measure neutral-to-worse (c64 gathers cost 2x,
    one-hot matmuls drown in N-dimension padding); the real fix is a Pallas
    interp kernel on hardware whose Mosaic DMA is not relay-bound."""
    low = jnp.floor(pos)
    li = low.astype(jnp.int32)
    frac = (pos - low).astype(jnp.float32)
    lo = spectral._gather_band(rows, li)
    hi = spectral._gather_band(rows, li + 1)
    return lo + (hi - lo) * frac


def _interp_mode() -> str:
    """Fractional-bin interpolation strategy for the mapped regime.

    "window" replaces XLA's per-element dynamic gather (~14-56 ns/element on
    TPU -- the scalar core walks every index) with an exact windowed one-hot
    selection on the MXU: output bins are processed in chunks of C, each chunk
    dynamic-slices an L-wide window of the source rows (anchored at the
    chunk's min index), and a [2C, L] one-hot matrix selects the floor/ceil
    taps as one matmul.  With Precision.HIGHEST the selection is BIT-EXACT
    (0/1 weights are exact in every bf16 pass and adding zeros is exact).
    On TPU the final `lo + (hi - lo) * frac` then matches _interp_gather bit
    for bit (measured); on CPU LLVM may contract the lerp into an fma inside
    the fused consumer loop, giving <=1 ulp deviation (tests allow it).
    Measured ~1.2-2.1 ns/element at bench shapes -- 26-46x over gather.
    """
    mode = os.environ.get("SST_INTERP", "auto")
    if mode == "auto":
        return "window" if jax.default_backend() != "cpu" else "gather"
    return mode


# (C, L) geometries ordered by measured cost (ns/element at bench shapes);
# capacity = L - 3 bins of position spread within a C-chunk.
_WINDOW_GEOMETRIES = ((64, 128), (128, 256), (128, 384), (128, 512),
                      (128, 768), (128, 1024))


def _window_geometry(grad_bound: float, rand_extra: float):
    """Pick the cheapest (C, L) whose capacity covers the worst within-chunk
    position spread: the output map's slope is bounded by 1.5x the inverse
    frequency-map gradient (smoothstep overshoot, :894-912), plus the
    randomized binTimeFactor range, plus slack."""
    for C, L in _WINDOW_GEOMETRIES:
        need = 1.5 * grad_bound * (C - 1) + rand_extra + 6.0
        if need <= L - 3:
            return C, L
    return None


def interp_planes_window_multi(planes: jnp.ndarray, pos_sets,
                               C: int, L: int, slab: int = 8):
    """Exact fractional interpolation of plane prefixes at SEVERAL position
    sets over ONE shared window extraction.

    planes [nB, n, W0] float32; pos_sets: list of (pos [nB, B], nsel, taps)
    where set k interpolates the first `nsel` planes at its positions.  The
    window anchor is shared (min floor-index over all sets per C-chunk), so
    sets whose positions stay within the chunk's L-capacity of each other
    (e.g. the planner's input_bin / input_bin - tf / input_bin - longv*tf
    trio) pay the plane padding and window slicing ONCE.

    Per set: taps False -> [nB, nsel, B] lerp; True -> (lo, hi) tap pair.
    Returns (list of per-set results, violations).  Values are zero outside
    [0, W0) (matching _interp_gather; the L-wide zero pads make the
    out-of-range taps land on zeros, no masks needed).  The hi tap is the
    SAME one-hot row applied to a one-lane-shifted window (zero-filled at
    lane L-1), which is bit-identical to a dedicated hi one-hot: in-capacity
    rows have rel <= L-2, and an over-capacity row (counted in `violations`)
    selects lane L-1 whose shifted value is the same 0 the hi mask produced.
    Halves the selection-matrix bytes per set vs a [2C, L] lo+hi matrix.
    """
    impl = os.environ.get("SST_INTERP_IMPL", "auto")
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError("SST_INTERP_IMPL must be auto, xla or pallas")
    if (impl != "xla" and jax.default_backend() != "cpu"
            and pos_sets[0][0].shape[1] % 128 == 0):
        # Pallas windowed interp (ops/pallas/interp.py): bit-exact vs this
        # path (tests/test_pallas_interp.py) and keeps the windows and
        # selection matrices in VMEM — mapped plan 1231 -> 915 ms at bench
        # shapes (tools/profile_stages SST_PROF_MAPPED=1)
        from .ops.pallas import interp as pallas_interp
        return pallas_interp.interp_multi(planes, pos_sets, L)
    if impl == "pallas":
        raise ValueError("SST_INTERP_IMPL=pallas unsupported here "
                         "(CPU backend or B %% 128 != 0)")

    nB, n, W0 = planes.shape
    B = pos_sets[0][0].shape[1]
    nchunk = -(-B // C)
    Bp = nchunk * C
    nslab = -(-nB // slab)
    nBp = nslab * slab
    f1 = jnp.float32

    li_sets, frac_sets = [], []
    for pos, nsel, taps in pos_sets:
        ppos = jnp.pad(pos, ((0, nBp - nB), (0, Bp - B)), mode="edge")
        low = jnp.floor(ppos)
        li_sets.append(low.astype(jnp.int32).reshape(nslab, slab, nchunk, C))
        frac_sets.append((ppos - low).astype(jnp.float32)
                         .reshape(nslab, slab, nchunk, C))
    pl = jnp.pad(planes, ((0, nBp - nB), (0, 0), (0, 0)))
    pz = jnp.pad(pl.reshape(nslab, slab, n, W0),
                 ((0, 0), (0, 0), (0, 0), (L, L)))

    def do_slab(args):
        lics, frcs, pzs = args
        # lics/frcs: tuples per set [slab, nchunk, C]; pzs [slab, n, W0 + 2L]
        smin = functools.reduce(jnp.minimum,
                                [jnp.min(lic, axis=-1) for lic in lics])
        s = jnp.clip(smin - 1, -L, W0)                      # [slab, nchunk]

        def sl(row, s0):
            return jax.lax.dynamic_slice(row, (0, s0 + L), (n, L))

        win = jax.vmap(jax.vmap(sl, in_axes=(None, 0)),
                       in_axes=(0, 0))(pzs, s)              # [slab,nchunk,n,L]
        # hi taps read the same window shifted one lane (zero at lane L-1)
        win_h = jnp.concatenate(
            [win[..., 1:], jnp.zeros(win.shape[:-1] + (1,), win.dtype)], -1)
        wio = jnp.arange(L, dtype=jnp.int32)
        outs, bad = [], jnp.int32(0)
        for (lic, frc, (pos, nsel, taps)) in zip(lics, frcs, pos_sets):
            rel = lic - s[..., None]                        # [slab, nchunk, C]
            vlo = (lic >= 0) & (lic < W0)
            bad = bad + (vlo & ((rel < 0) | (rel > L - 2))).sum()
            # one-hot LO rows only; keep every minor dim at L / C (128-
            # aligned) -- an [..., n] minor axis lane-pads to 128 and
            # relayouts ~13x the useful bytes (the old batch-24 OOM)
            M = jnp.where(rel[..., None] == wio, f1(1), f1(0))
            w2 = jnp.concatenate([win[..., :nsel, :], win_h[..., :nsel, :]],
                                 axis=-2)                   # [slab,nc,2nsel,L]
            out = jnp.einsum("scnw,scxw->scnx", w2, M,
                             precision=jax.lax.Precision.HIGHEST)
            lo = jnp.transpose(out[..., :nsel, :], (0, 2, 1, 3)) \
                .reshape(slab, nsel, Bp)
            hi = jnp.transpose(out[..., nsel:, :], (0, 2, 1, 3)) \
                .reshape(slab, nsel, Bp)
            if taps:
                outs.append(lo)
                outs.append(hi)
            else:
                f2 = jnp.transpose(
                    jnp.broadcast_to(frc[..., None, :],
                                     frc.shape[:2] + (nsel, C)),
                    (0, 2, 1, 3)).reshape(slab, nsel, Bp)
                outs.append(lo + (hi - lo) * f2)
        return tuple(outs), bad

    outs, bads = jax.lax.map(do_slab, (tuple(li_sets), tuple(frac_sets), pz))

    def trim(o):
        nsel = o.shape[2]
        return o.reshape(nBp, nsel, Bp)[:nB, :, :B]

    results, i = [], 0
    for pos, nsel, taps in pos_sets:
        if taps:
            results.append((trim(outs[i]), trim(outs[i + 1])))
            i += 2
        else:
            results.append(trim(outs[i]))
            i += 1
    return results, jnp.sum(bads)


def interp_planes_window(planes: jnp.ndarray, pos: jnp.ndarray,
                         C: int, L: int, slab: int = 8,
                         taps: bool = False):
    """Exact fractional interpolation of n planes at shared positions.

    planes [nB, n, W0] float32, pos [nB, B] -> ([nB, n, B], violations).
    Values are zero outside [0, W0) (matching _interp_gather); `violations`
    counts in-range positions that fell outside their chunk's L-window (the
    geometry guarantees zero for maps within the declared gradient bound --
    tests assert it, and the count is returned for diagnostics).

    With taps=True returns ((lo, hi), violations) instead of the assembled
    lerp: lo[b] = planes[floor(pos[b])], hi[b] = planes[floor(pos[b]) + 1]
    (zero outside [0, W0)) -- the exact tap pair, for callers with different
    boundary/combination semantics (e.g. the peak-table lookups).
    """
    n = planes.shape[1]
    results, bad = interp_planes_window_multi(
        planes, [(pos, n, taps)], C, L, slab)
    return results[0], bad


class _WindowInterp:
    """Bound interpolator: packs complex/real rows, applies the windowed
    selection, tracks the violation diagnostic across calls."""

    def __init__(self, C: int, L: int):
        self.C, self.L = C, L
        self.violations = jnp.int32(0)

    def multi(self, rows_list, specs):
        """One shared-window call over several position sets.

        rows_list: list of [nB, W0] arrays (f32 or c64, same W0); specs:
        list of (pos [nB, B], n_rows) where each set interpolates the FIRST
        n_rows entries of rows_list at its positions.  Returns a list (per
        set) of lists of interpolated [nB, B] arrays.  All sets' positions
        must stay within the (C, L) capacity of the shared chunk anchors —
        the planner's prelim/vote position trio does by construction
        (offsets bounded by longv * timeFactor, included in the geometry
        margin).  Shares the plane padding and window extraction across
        sets: at bench shapes those are ~70% of a windowed interp call.
        """
        planes, kinds, offsets = [], [], []
        for r in rows_list:
            offsets.append(len(planes))
            if jnp.iscomplexobj(r):
                planes += [r.real, r.imag]
                kinds.append("c")
            else:
                planes.append(r)
                kinds.append("f")
        offsets.append(len(planes))
        pos_sets = [(pos, offsets[n_rows], False) for pos, n_rows in specs]
        results, bad = interp_planes_window_multi(
            jnp.stack(planes, axis=1), pos_sets, self.C, self.L)
        self.violations = self.violations + bad
        outs = []
        for (pos, n_rows), vals in zip(specs, results):
            out, i = [], 0
            for k in kinds[:n_rows]:
                if k == "c":
                    out.append(jax.lax.complex(vals[:, i], vals[:, i + 1]))
                    i += 2
                else:
                    out.append(vals[:, i])
                    i += 1
            outs.append(out)
        return outs

    def __call__(self, rows_list, pos):
        """rows_list: list of [nB, W0] arrays (f32 or c64, same W0);
        pos [nB, B].  Returns list of interpolated [nB, B] arrays."""
        planes = []
        kinds = []
        for r in rows_list:
            if jnp.iscomplexobj(r):
                planes += [r.real, r.imag]
                kinds.append("c")
            else:
                planes.append(r)
                kinds.append("f")
        vals, bad = interp_planes_window(
            jnp.stack(planes, axis=1), pos, self.C, self.L)
        self.violations = self.violations + bad
        out = []
        i = 0
        for k in kinds:
            if k == "c":
                out.append(jax.lax.complex(vals[:, i], vals[:, i + 1]))
                i += 2
            else:
                out.append(vals[:, i])
                i += 1
        return out


def _interp_shift(rows: jnp.ndarray, shift: jnp.ndarray, margin: int) -> jnp.ndarray:
    """rows [nB, B] interpolated at positions float32(b) - shift[k] via one
    dynamic slice + lerp per block (no gathers).  |shift| must be < margin.

    Bit-matches the gather path: the position is the *rounded* float32
    difference (the reference computes `inputBin - binTimeFactor` in float,
    :750), so floor(p) can be either b-floor(shift)-1 or b-floor(shift)
    depending on per-bin rounding — hence the three-row window and select.

    The pad/window widths are fixed at 128 (>= any clean-regime margin) so
    every materialized buffer keeps a 128-multiple minor dim — unaligned
    minors relayout at ~1/10 bandwidth on TPU."""
    nB, B = rows.shape
    M = 128
    assert margin <= M, margin
    pad = jnp.zeros((nB, M), rows.dtype)
    padded = jnp.concatenate([pad, rows, pad], axis=1)
    m = jnp.floor(shift).astype(jnp.int32)            # per-block

    def slice_row(row, s):
        return jax.lax.dynamic_slice_in_dim(row, s, B + M)

    win = jax.vmap(slice_row)(padded, M - 1 - m)      # [nB, B+M]
    v_a = win[:, :B]          # arr[b - m - 1]
    v_b = win[:, 1:B + 1]     # arr[b - m]
    v_c = win[:, 2:B + 2]     # arr[b - m + 1]

    b_f = jnp.arange(B, dtype=jnp.float32)
    p = b_f[None, :] - shift[:, None]                 # float32-rounded position
    li = jnp.floor(p)
    frac = (p - li).astype(jnp.float32)
    hi_case = li.astype(jnp.int32) == (jnp.arange(B)[None, :] - m[:, None])
    lo_val = jnp.where(hi_case, v_b, v_a)
    hi_val = jnp.where(hi_case, v_c, v_b)
    return lo_val + (hi_val - lo_val) * frac


def _interp_shift_static(rows: jnp.ndarray, shift_np: np.ndarray) -> jnp.ndarray:
    """rows [nB, B] interpolated at positions float32(b) - shift_np[k].

    shift_np is HOST-side float32 (the schedule's time factors are static),
    so all position math — floor, frac, per-bin lo/hi tap choice — happens in
    numpy with the same IEEE float32 ops the traced version would use, and
    the device work collapses to a fused select/lerp over a handful of
    statically shifted row views (one per distinct tap shift).  No dynamic
    slices, no gathers, no unaligned windows.  Bit-matches _interp_shift.
    """
    nB, B = rows.shape
    b = np.arange(B, dtype=np.float32)
    p = (b[None, :] - shift_np[:, None].astype(np.float32)).astype(np.float32)
    li = np.floor(p)
    frac = (p - li).astype(np.float32)
    s_lo = np.arange(B, dtype=np.int64)[None, :] - li.astype(np.int64)
    assert (s_lo >= 1).all(), "static shift interp expects shift >= 0.5"

    views = {}

    def view(s):
        s = int(s)
        if s not in views:
            z = jnp.zeros((nB, min(s, B)), rows.dtype)
            views[s] = jnp.concatenate([z, rows[:, :max(B - s, 0)]], 1)
        return views[s]

    svals = [int(s) for s in np.unique(s_lo)]
    v_lo = view(svals[0])
    v_hi = view(svals[0] - 1)
    for s in svals[1:]:
        m = jnp.asarray(s_lo == s)
        v_lo = jnp.where(m, view(s), v_lo)
        v_hi = jnp.where(m, view(s - 1), v_hi)
    return v_lo + (v_hi - v_lo) * jnp.asarray(frac)


def _segsum_mode() -> str:
    """Run-segment summation strategy for the peak finder.

    "matmul": windowed one-hot MXU formulation -- each 512-bin chunk's run
    ids stay within ceil(512/2)+1 of the chunk-start id (run starts are >=2
    bins apart), so a [C, 384] one-hot matmul produces chunk-local partial
    sums which are then shifted to absolute segment positions (batched
    dynamic_slice) and added.  ~10x faster than TPU scatter-add, but the
    per-segment accumulation order differs from the reference's sequential
    += (bin-ascending scatter), so peak centroids can drift ~1 ulp -- fine
    for the chaos-gated mapped regime, kept off the CPU parity path.
    """
    mode = os.environ.get("SST_SEGSUM", "auto")
    if mode == "auto":
        return "matmul" if jax.default_backend() != "cpu" else "scatter"
    return mode


def _segment_sum_runs(data_planes, seg, above, nseg, C=512, slab=8):
    """Windowed segment sum: data_planes [nB, n, B] f32, seg [nB, B] int32
    nondecreasing run ids (increments <= 1 every 2 bins), above [nB, B] mask
    of contributing bins.  Returns [nB, n, nseg] sums."""
    nB, n, B = data_planes.shape
    nchunk = -(-B // C)
    Bp = nchunk * C
    Lp = C // 2 + 128          # max in-chunk id delta is ceil(C/2)+1
    nslab = -(-nB // slab)
    nBp = nslab * slab
    f1 = jnp.float32

    segp = jnp.pad(seg, ((0, nBp - nB), (0, Bp - B)), mode="edge")
    maskp = jnp.pad(above, ((0, nBp - nB), (0, Bp - B)))
    datap = jnp.pad(data_planes, ((0, nBp - nB), (0, 0), (0, Bp - B)))
    seg_c = segp.reshape(nBp, nchunk, C)
    anchors = seg_c[:, :, 0]                                # [nBp, nchunk]
    rel = seg_c - anchors[:, :, None]
    mask_c = maskp.reshape(nBp, nchunk, C)
    # keep n OUT of the minor dim everywhere: a [..., n] minor axis lane-pads
    # to 128 and relayouts ~64x the useful bytes for n=2
    data_c = jnp.transpose(datap.reshape(nBp, n, nchunk, C), (0, 2, 1, 3))

    def do_slab(args):
        relc, mc, dc, anc = args
        # relc [slab, nchunk, C]; dc [slab, nchunk, n, C]; anc [slab, nchunk]
        lio = jnp.arange(Lp, dtype=jnp.int32)
        M = jnp.where((relc[..., None] == lio) & mc[..., None], f1(1), f1(0))
        partial = jnp.einsum("scnx,scxl->scnl", dc, M,
                             precision=jax.lax.Precision.HIGHEST)
        # shift partials to absolute segment positions and accumulate along
        # the minor (lane) axis; anchors range [-1, nseg) (run_id is -1
        # before the first run), so pad enough that no start ever clamps
        pp = jnp.pad(partial, ((0, 0), (0, 0), (0, 0),
                               (nseg + 8, max(0, nseg + 8 - Lp))))

        def sl(row, a):    # row [n, 2*nseg + 16]
            return jax.lax.dynamic_slice(row, (0, nseg + 8 - a), (n, nseg))

        shifted = jax.vmap(jax.vmap(sl, in_axes=(0, 0)),
                           in_axes=(0, 0))(pp, anc)
        return jnp.sum(shifted, axis=1)                      # [slab, n, nseg]

    outs = jax.lax.map(do_slab, (rel.reshape(nslab, slab, nchunk, C),
                                 mask_c.reshape(nslab, slab, nchunk, C),
                                 data_c.reshape(nslab, slab, nchunk, n, C),
                                 anchors.reshape(nslab, slab, nchunk)))
    return outs.reshape(nBp, n, nseg)[:nB]                   # [nB, n, nseg]


def _rank_geometry(grad_bound: float):
    """(C, L) for _rank_taps_window: a C-bin output chunk holds at most
    C*grad_bound/2 + 2 peaks (cell spacing >= 2/grad_bound for the built-in
    monotone maps), which must fit the L-window with tap slack."""
    for C, L in ((128, 128), (64, 128), (128, 256), (64, 256), (32, 256)):
        if C * grad_bound / 2.0 + 6.0 <= L - 2:
            return C, L
    return None


def _rank_taps_window(cells, tables, B, C, L, slab=8):
    """Fused peak rank + peak-table tap extraction over ONE shared window.

    cells [nB, nseg] int32 NONDECREASING (built-in frequency maps are
    monotone; invalid peaks sit at cell == B); tables [nB, n, nseg] f32.
    Returns (k [nB, B] int32, lo [nB, n, B], hi [nB, n, B], violations) with
    k[b] = #cells <= b (:888-891), lo = tables[k-1], hi = tables[k] (zero
    outside [0, nseg)).

    Per C-bin output chunk: k0 = #cells below the chunk start (a cheap
    compare-reduce over nseg at chunk granularity), ONE [1+n, L] window of
    the peak arrays anchored at peak k0-1, an in-window compare-reduce
    finishing the rank (cells are sorted, so every peak with cell inside
    the chunk has rank within the window — the geometry bound), and a
    one-hot tap select against the same window (hi = the one-lane-shifted
    window, as in interp_planes_window_multi).  Replaces a global
    [nB, B, nseg] rank compare AND a second window extraction; `violations`
    counts chunks whose peak population overflowed the window (never, for
    maps within the declared gradient bound — same contract as the interp).
    """
    nB, nseg = cells.shape
    n = tables.shape[1]
    nchunk = -(-B // C)
    Bp = nchunk * C
    nslab = -(-nB // slab)
    nBp = nslab * slab
    f1 = jnp.float32

    cellsP = jnp.pad(cells, ((0, nBp - nB), (0, 0)), constant_values=B)
    tablesP = jnp.pad(tables, ((0, nBp - nB), (0, 0), (0, 0)))
    starts = jnp.arange(nchunk, dtype=jnp.int32) * C
    # base rank per chunk: ops nB*nchunk*nseg (tiny next to nB*B*nseg)
    k0 = jnp.sum((cellsP[:, None, :] < starts[None, :, None])
                 .astype(jnp.int32), axis=2)               # [nBp, nchunk]
    a = k0 - 1                                             # window anchor
    cz = jnp.pad(cellsP, ((0, 0), (L, L)), constant_values=B)
    tz = jnp.pad(tablesP, ((0, 0), (0, 0), (L, L)))
    bvals = jnp.arange(Bp, dtype=jnp.int32).reshape(nchunk, C)
    wio = jnp.arange(L, dtype=jnp.int32)

    def do_slab(args):
        av, czs, tzs = args
        # av [slab, nchunk]; czs [slab, nseg+2L]; tzs [slab, n, nseg+2L]

        def slc(row, s0):
            return jax.lax.dynamic_slice(row, (s0 + L,), (L,))

        def slt(row, s0):
            return jax.lax.dynamic_slice(row, (0, s0 + L), (n, L))

        winc = jax.vmap(jax.vmap(slc, in_axes=(None, 0)),
                        in_axes=(0, 0))(czs, av)           # [slab, nchunk, L]
        wint = jax.vmap(jax.vmap(slt, in_axes=(None, 0)),
                        in_axes=(0, 0))(tzs, av)           # [slab,nchunk,n,L]
        # in-window rank: count peaks a+w (w>=1) with cell <= b
        cnt = (winc[:, :, None, :] <= bvals[None, :, :, None]) \
            & (wio >= 1)
        kloc = jnp.sum(cnt.astype(jnp.int32), axis=-1)     # [slab, nchunk, C]
        # overflow: a peak at the window's edge still maps inside the chunk
        edge = winc[:, :, L - 1] <= (starts + (C - 1))[None, :]
        bad = edge.sum() + (kloc > L - 2).sum()

        M = jnp.where(kloc[..., None] == wio, f1(1), f1(0))
        win_h = jnp.concatenate(
            [wint[..., 1:], jnp.zeros(wint.shape[:-1] + (1,), wint.dtype)],
            -1)
        w2 = jnp.concatenate([wint, win_h], axis=-2)       # [slab,nc,2n,L]
        out = jnp.einsum("scnw,scxw->scnx", w2, M,
                         precision=jax.lax.Precision.HIGHEST)

        def fold(res):                                     # [slab,nchunk,n,C]
            return jnp.transpose(res, (0, 2, 1, 3)).reshape(slab, n, Bp)

        k_full = (av[..., None] + 1 + kloc).reshape(slab, Bp)
        return (k_full, fold(out[..., :n, :]), fold(out[..., n:, :])), bad

    (ks, los, his), bads = jax.lax.map(
        do_slab, (a.reshape(nslab, slab, nchunk),
                  cz.reshape(nslab, slab, nseg + 2 * L),
                  tz.reshape(nslab, slab, n, nseg + 2 * L)))
    k = ks.reshape(nBp, Bp)[:nB, :B]
    lo = los.reshape(nBp, n, Bp)[:nB, :, :B]
    hi = his.reshape(nBp, n, Bp)[:nB, :, :B]
    return k, lo, hi, jnp.sum(bads)


def _segmented_run_sums(data, start, above):
    """Per-bin totals of each `above`-run along the last axis.

    data [..., B] (already masked to zero outside runs), start [..., B] run
    start flags.  Returns [..., B] where every bin of a run holds the run's
    total (garbage outside runs — callers mask).  Two log-depth associative
    scans: a segmented prefix sum (reset at starts), then a reverse
    copy-with-reset that propagates each run's last prefix value backward."""
    def seg_sum(l, r):
        return (jnp.where(r[1], r[0], l[0] + r[0]), l[1] | r[1])

    prefix, _ = jax.lax.associative_scan(seg_sum, (data, start), axis=-1)
    # run end at bin b <=> next bin starts a new run (or b is last)
    end = jnp.concatenate(
        [start[..., 1:], jnp.ones(start.shape[:-1] + (1,), bool)], -1)
    rev = prefix[..., ::-1]
    rend = end[..., ::-1]

    def seg_copy(l, r):
        return (jnp.where(r[1], r[0], l[0]), l[1] | r[1])

    tot_rev, _ = jax.lax.associative_scan(seg_copy, (rev, rend), axis=-1)
    return tot_rev[..., ::-1]


def _peaks_and_map_merge(energy, smoothed, controls, flags, consts):
    """Sort-merge formulation of the peaks/output-map builder.

    The windowed formulation (_peaks_and_map_batched below) extracts a
    dynamic [n, L] window per (row, 64-bin chunk) — ~21k vmapped
    dynamic-slices per clip that lower to gathers and measured ~900 ms of
    the mapped plan at bench shapes (tools/exp_map_pieces.py; TPU scatter
    is worse still, 2.2 s).  This version never gathers or scatters:

      1. run sums (peak centroids) via two segmented associative scans in
         bin space (38 ms vs the windowed segment sum's 246 ms);
      2. prev/next-peak-per-bin via a stable MERGE: sort the B query bins
         (key 2b+1) against the peaks placed at their output cells (key
         2*cell, so a peak at cell == b sorts before the query and lands
         in the <=-side, matching k[b] = #cells <= b, reference :888-891),
         then directional last-valid fills, then a stable 1-bit sort that
         compacts the queries back in bin order;
      3. the smoothstep interpolation tail shared with the windowed path.

    MINIMAL SORT PAYLOADS (round 5): the two lax.sort calls dominated the
    mapped plan (~218 ms of 552.7 at bench shapes).  TPU sort cost scales
    with the number of operand planes, so everything recomputable rides
    nowhere: the merge sort carries ONE f32 payload (the peak centroid
    avg_band) — is_peak / the query bin are decoded from the sorted key,
    both directional fills mask that single payload with +/-inf, and the
    compaction key is rebuilt from the sorted keys.  The mapped
    coordinates prev_o/next_o are recomputed pointwise AFTER compaction
    via the same freq_to_band(map_freq(band_to_freq(x))) chain that
    built peak_out_raw — bit-identical since the fills select exact
    avg_band values (sorted planes: 2 + 3 vs the original 6 + 5).

    Values match the windowed path to float reassociation (the centroid
    sums accumulate in scan-tree order; the reference's own sequential
    order differs from BOTH — docs/PARITY.md chaos taxonomy).  Exact by
    construction (no capacity windows), so violations = 0."""
    f1 = jnp.float32
    nB, B = energy.shape
    above = energy > smoothed
    start = above & jnp.concatenate(
        [jnp.ones((nB, 1), bool), ~above[:, :-1]], axis=1)
    b_idx = jnp.arange(B, dtype=jnp.float32)

    em = jnp.where(above, energy, 0)
    band_sum = _segmented_run_sums(b_idx[None] * em, start, above)
    energy_sum = _segmented_run_sums(em, start, above)
    n_peaks = jnp.sum(start.astype(jnp.int32), axis=1)             # [nB]

    avg_band = band_sum / jnp.where(energy_sum == 0, f1(1), energy_sum)
    avg_freq = spectral._band_to_freq(avg_band, consts)
    peak_out_raw = spectral._freq_to_band(
        spectral.map_freq(avg_freq, controls, flags), consts)      # [nB, B]

    # row scalars (peak centroids/cells are increasing across runs)
    pinf = jnp.float32(np.inf)
    first_in = jnp.min(jnp.where(start, avg_band, pinf), axis=1)
    first_out = jnp.min(jnp.where(start, peak_out_raw, pinf), axis=1)
    last_in = jnp.max(jnp.where(start, avg_band, -pinf), axis=1)
    last_out_r = jnp.max(jnp.where(start, peak_out_raw, -pinf), axis=1)
    has = n_peaks > 0
    last_out = jnp.where(has, last_out_r, f1(0))

    cells = jnp.clip(jnp.ceil(peak_out_raw), 0, B).astype(jnp.int32)

    # ---- merge peaks (at their cells) with the query bins ----
    # Unique integer keys (no stable sort needed): (position << 13) | tag,
    # where a peak at cell c carries tag = its source bin (< 4096) and a
    # query at bin b carries tag = 0x1000 — so a peak with cell == b sorts
    # BEFORE the bin-b query (k[b] counts cells <= b, reference :888-891)
    # and equal-cell peak groups keep source order.
    i_idx = jnp.arange(B, dtype=jnp.int32)[None]
    key_peak = jnp.where(start, (cells << 13) | i_idx,
                         ((B + 1) << 13))
    key_query = (i_idx << 13) | 0x1000
    keys = jnp.concatenate([key_peak,
                            jnp.broadcast_to(key_query, (nB, B))], 1)
    ninf = jnp.float32(-np.inf)
    pinf_f = jnp.float32(np.inf)
    # single sorted payload: the peak centroid (query/sentinel slots are
    # masked off after the sort via the decoded key, so their values are
    # free to be garbage)
    v_pay = jnp.concatenate([avg_band, jnp.zeros((nB, B), jnp.float32)], 1)
    keys_s, v_s = jax.lax.sort([keys, v_pay], dimension=1, num_keys=1)
    tag = keys_s & 0x1fff
    # queries carry tag 0x1000 (> any source bin < B); sentinels are
    # exactly (B+1)<<13 with tag 0 — real peaks are everything else
    is_peak = (tag != 0x1000) & (keys_s < ((B + 1) << 13))
    # both fields are INCREASING along the merged order (monotone map,
    # ascending centroids), so the directional last/next-peak fills are
    # plain cummax / cummin — no validity flags to carry
    lo_i_f = jax.lax.cummax(jnp.where(is_peak, v_s, ninf), axis=1)
    hi_i_f = jax.lax.cummin(
        jnp.where(is_peak, v_s, pinf_f)[:, ::-1], axis=1)[:, ::-1]
    # compaction key, rebuilt from the sorted keys: queries first in bin
    # order, peaks/sentinels after (their relative order is discarded)
    qb = jnp.where(tag == 0x1000, keys_s >> 13, (1 << 13) | tag)
    _, lo_i_c, hi_i_c = jax.lax.sort([qb, lo_i_f, hi_i_f], dimension=1,
                                     num_keys=1)
    prev_in_, next_in_ = lo_i_c[:, :B], hi_i_c[:, :B]
    lo_v = prev_in_ > ninf
    hi_v = next_in_ < pinf_f
    # mapped coordinates, recomputed pointwise: the same float chain that
    # built peak_out_raw applied to the exact centroid the fill selected
    prev_o = spectral._freq_to_band(
        spectral.map_freq(spectral._band_to_freq(prev_in_, consts),
                          controls, flags), consts)
    next_o = spectral._freq_to_band(
        spectral.map_freq(spectral._band_to_freq(next_in_, consts),
                          controls, flags), consts)
    # the windowed path's 0-filled tables produce 0 outside valid taps
    next_o = jnp.where(hi_v, next_o, 0)
    next_in_ = jnp.where(hi_v, next_in_, 0)
    prev_o = jnp.where(lo_v, prev_o, 0)
    prev_in_ = jnp.where(lo_v, prev_in_, 0)

    range_scale = f1(1) / (next_o - prev_o)
    out_offset = prev_in_ - prev_o
    out_scale = next_in_ - next_o - prev_in_ + prev_o
    grad_scale = out_scale * range_scale
    r = (b_idx[None] - prev_o) * range_scale
    h = r * r * (3 - 2 * r)
    pair_bin = b_idx[None] + out_offset + h * out_scale
    pair_grad = 1 + (6 * r * (1 - r)) * grad_scale

    top_start = jnp.maximum(jnp.int32(0), last_out.astype(jnp.int32))
    is_top = jnp.arange(B)[None] >= top_start[:, None]
    is_bottom = ~lo_v & ~is_top
    input_bin = jnp.where(
        is_top, b_idx[None] + (last_in - last_out)[:, None],
        jnp.where(is_bottom, b_idx[None] + (first_in - first_out)[:, None],
                  pair_bin))
    freq_grad = jnp.where(is_top | is_bottom, f1(1), pair_grad)

    no_peaks = ~has[:, None]
    input_bin = jnp.where(no_peaks, b_idx[None], input_bin)
    freq_grad = jnp.where(no_peaks, f1(1), freq_grad)
    return input_bin, freq_grad, jnp.int32(0)


def _peakmap_mode() -> str:
    """Peaks/output-map builder strategy: 'merge' (sort-merge, exact, no
    gathers/scatters — TPU default) or 'window' (per-chunk windowed taps —
    CPU default, value-matched to the per-block engine's accumulation
    order).  Override with SST_PEAKMAP."""
    mode = os.environ.get("SST_PEAKMAP", "auto")
    if mode == "auto":
        return "merge" if jax.default_backend() != "cpu" else "window"
    if mode not in ("merge", "window"):
        raise ValueError("SST_PEAKMAP must be merge or window, got %r" % mode)
    return mode


def _peaks_and_map_batched(energy, smoothed, controls, flags, consts, geom):
    if _peakmap_mode() == "merge":
        return _peaks_and_map_merge(energy, smoothed, controls, flags,
                                    consts)
    return _peaks_and_map_windowed(energy, smoothed, controls, flags,
                                   consts, geom)


def _peaks_and_map_windowed(energy, smoothed, controls, flags, consts, geom):
    """Batched twin of spectral._peaks_and_map over [nB, B], with the
    per-bin peak-table lookups (peak_out/peak_in at k-1 and k, :894-912)
    done as exact windowed tap selection on the MXU instead of dynamic
    gathers (~500 ms -> ~50 ms at bench shapes).

    Value-identical to the vmapped per-block version: the tap select is
    exact, and the only entries that differ from its clipped gathers (the
    prev-tap at k == 0) feed lanes the bottom mask discards.  Controls
    leaves are scalars or [nB, 1] (automation).  Returns
    (input_bin, freq_grad, window_violations).
    """
    f1 = jnp.float32
    nB, B = energy.shape
    nseg = B // 2 + 2
    above = energy > smoothed
    start = above & jnp.concatenate(
        [jnp.ones((nB, 1), bool), ~above[:, :-1]], axis=1)
    run_id = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1
    seg = jnp.where(above, run_id, nseg - 1)
    b_idx = jnp.arange(B, dtype=jnp.float32)

    if _segsum_mode() == "matmul":
        sums = _segment_sum_runs(
            jnp.stack([b_idx[None] * energy, energy], axis=1),
            run_id, above, nseg)
        band_sum, energy_sum = sums[:, 0], sums[:, 1]
    else:
        seg_sum = jax.vmap(
            lambda d, s: jax.ops.segment_sum(d, s, num_segments=nseg))
        band_sum = seg_sum(b_idx[None] * energy, seg)
        energy_sum = seg_sum(energy, seg)
    n_peaks = jnp.sum((start & above).astype(jnp.int32), axis=1)   # [nB]

    valid = jnp.arange(nseg)[None] < n_peaks[:, None]
    avg_band = band_sum / jnp.where(energy_sum == 0, f32(1), energy_sum)
    peak_in = jnp.where(valid, avg_band, f32(0))
    avg_freq = spectral._band_to_freq(avg_band, consts)
    peak_out_raw = spectral._freq_to_band(
        spectral.map_freq(avg_freq, controls, flags), consts)
    peak_out = jnp.where(valid, peak_out_raw, jnp.float32(np.inf))

    cells = jnp.where(valid,
                      jnp.clip(jnp.ceil(peak_out), 0, B).astype(jnp.int32),
                      jnp.int32(B))

    last = jnp.maximum(n_peaks - 1, 0)
    first_in, first_out = peak_in[:, 0], peak_out[:, 0]
    last_in = jnp.take_along_axis(peak_in, last[:, None], 1)[:, 0]
    valid_last = jnp.take_along_axis(valid, last[:, None], 1)[:, 0]
    last_out = jnp.where(valid_last,
                         jnp.take_along_axis(peak_out, last[:, None], 1)[:, 0],
                         f32(0))

    # prev/next peak per bin: taps at k-1 / k of the [peak_out, peak_in]
    # tables (pos k-0.5 makes floor/ceil land exactly there).  The matmul
    # multiplies EVERY window entry by its (mostly zero) weight, so the inf
    # fill of invalid peak_out entries would produce 0*inf = NaN; use a
    # 0-filled table instead -- entries past n_peaks are only selected at
    # k == n_peaks lanes, which the top rule masks (k == n_peaks implies
    # b >= ceil(last_out) >= trunc(last_out)).
    peak_out_tbl = jnp.where(valid, peak_out_raw, f32(0))
    tables = jnp.stack([peak_out_tbl, peak_in], axis=1)            # [nB,2,nseg]
    rt_geom = (_rank_geometry(flags.inv_grad_bound)
               if (flags.inv_grad_bound is not None
                   and os.environ.get("SST_RANK", "window") == "window")
               else None)
    if rt_geom is not None:
        # fused rank + taps over one shared per-chunk window (see
        # _rank_taps_window) — the global [nB, B, nseg] rank compare and a
        # second window pass both collapse into it
        k, lo, hi, bad = _rank_taps_window(cells, tables, B, *rt_geom)
    else:
        # k[b] = #peaks with cell <= b (:888-891).  A fused compare-reduce
        # beats the scatter histogram + cumsum ~2x on TPU (scatters walk the
        # scalar core); invalid entries sit at cell == B, never counted.
        k = jnp.sum((cells[:, None, :] <= jnp.arange(B, dtype=jnp.int32)
                     [None, :, None]).astype(jnp.int32), axis=2)   # [nB, B]
        # tap geometry is map-independent: within a 128-bin chunk k rises
        # by at most ceil(128/2)+1 = 65 (run starts are >= 2 bins apart)
        (lo, hi), bad = interp_planes_window(
            tables, k.astype(jnp.float32) - f1(0.5), 128, 128, taps=True)
    prev_o, prev_in_ = lo[:, 0], lo[:, 1]
    next_o, next_in_ = hi[:, 0], hi[:, 1]

    range_scale = f32(1) / (next_o - prev_o)
    out_offset = prev_in_ - prev_o
    out_scale = next_in_ - next_o - prev_in_ + prev_o
    grad_scale = out_scale * range_scale
    r = (b_idx[None] - prev_o) * range_scale
    h = r * r * (3 - 2 * r)
    pair_bin = b_idx[None] + out_offset + h * out_scale
    pair_grad = 1 + (6 * r * (1 - r)) * grad_scale

    top_start = jnp.maximum(jnp.int32(0), last_out.astype(jnp.int32))
    is_top = jnp.arange(B)[None] >= top_start[:, None]
    is_bottom = (k == 0) & ~is_top
    input_bin = jnp.where(
        is_top, b_idx[None] + (last_in - last_out)[:, None],
        jnp.where(is_bottom, b_idx[None] + (first_in - first_out)[:, None],
                  pair_bin))
    freq_grad = jnp.where(is_top | is_bottom, f32(1), pair_grad)

    no_peaks = (n_peaks == 0)[:, None]
    input_bin = jnp.where(no_peaks, b_idx[None], input_bin)
    freq_grad = jnp.where(no_peaks, f32(1), freq_grad)
    return input_bin, freq_grad, bad


class SweepInputs(NamedTuple):
    """Flat per-(block, bin) sweep inputs, bins minor ([nB, B])."""
    a1: jnp.ndarray       # complex64 up-short vote coefficient
    a2: jnp.ndarray       # complex64 up-long
    d1: jnp.ndarray       # complex64 down-short
    d2: jnp.ndarray       # complex64 down-long
    mc: jnp.ndarray       # int32 max-energy channel
    pe: tuple             # ch x [nB, B] f32 prediction energies
    pi: tuple             # ch x [nB, B] complex64 prediction inputs


def _sel(mc, items):
    out = jnp.zeros_like(items[0])
    for c, it in enumerate(items):
        out = jnp.where(mc == c, it, out)
    return out


# f32 (re, im) pair complex arithmetic, mirroring XLA's complex lowering
# (mul: (ar*br - ai*bi, ar*bi + ai*br); conj folds sign into the products the
# way `x * jnp.conj(y)` lowers) so pair-plan values match the complex plan to
# reassociation noise only.
def _pmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _pmulc(a, b):
    """a * conj(b) on (re, im) pairs."""
    return (a[0] * b[0] + a[1] * b[1], a[1] * b[0] - a[0] * b[1])


def _psel(mc, pairs):
    return (_sel(mc, [p[0] for p in pairs]), _sel(mc, [p[1] for p in pairs]))


def _pmap(f, z):
    return (f(z[0]), f(z[1]))


# ---------------------------------------------------------------------------
# Batched precompute (stages a-f of SURVEY.md §3.3 for all blocks at once)
# ---------------------------------------------------------------------------
def _plan_tail_pair(sp, pv, arrays, flags, consts, tf):
    """plan_spectral for the unmapped / formant-free / non-randomized case on
    f32 (re, im) spectra plane pairs — no complex64 anywhere, so the planner
    output feeds the pair sweep's packed planes without an interleave/
    deinterleave round trip (the c64 SweepInputs boundary measured ~36 ms of
    the 142 ms sweep at bench shapes, tools/exp_sweep_prefix.py).

    Same formulas and operand order as the complex tail (reference
    signalsmith-stretch.h:697-803); complex mul/conj are expanded exactly as
    XLA lowers them, so values differ only by reassociation noise.
    """
    (sr, si), (pr, pv_i) = sp, pv
    nB, ch, B = sr.shape
    longv = consts.long_vertical_step
    new = arrays["new_spectrum"]
    reanalyse = arrays["reanalyse"]
    rot = consts.rotor                      # numpy complex64 [B]
    rotor = (jnp.asarray(rot.real), jnp.asarray(rot.imag))

    idx = np.arange(nB)
    src_input = np.maximum.accumulate(np.where(new, idx, -1))
    m_prev = np.empty(nB, np.int64)
    m_prev[0] = -1
    m_prev[1:] = src_input[:-1]

    def eff_input(z):
        if (src_input == idx).all():
            return z
        ze = z[np.maximum(src_input, 0)]
        return jnp.where(jnp.asarray((src_input >= 0))[:, None, None], ze, 0)

    ie = (eff_input(sr), eff_input(si))

    def eff_prev(zp, z):
        if reanalyse.all():
            return zp
        base_idx = np.where(new & ~reanalyse, np.maximum(m_prev, 0),
                            np.maximum(src_input, 0))
        base_valid = np.where(new & ~reanalyse, m_prev >= 0, src_input >= 0)
        pb = jnp.where(jnp.asarray(reanalyse)[:, None, None], zp, z[base_idx])
        return jnp.where(jnp.asarray(base_valid | reanalyse)[:, None, None],
                         pb, 0)

    pb = (eff_prev(pr, sr), eff_prev(pv_i, si))
    if new.all():
        pe_ = _pmul(pb, (rotor[0][None, None], rotor[1][None, None]))
    else:
        rotated = _pmul(pb, (rotor[0], rotor[1]))
        nmask = jnp.asarray(new)[:, None, None]
        pe_ = (jnp.where(nmask, rotated[0], pb[0]),
               jnp.where(nmask, rotated[1], pb[1]))

    # per-channel planes [nB, B]
    pi = [(ie[0][:, c], ie[1][:, c]) for c in range(ch)]
    prev_i = [(pe_[0][:, c], pe_[1][:, c]) for c in range(ch)]
    pe = [p[0] * p[0] + p[1] * p[1] for p in pi]
    pe_prev = [jnp.concatenate([jnp.zeros((1, B), x.dtype), x[:-1]], 0)
               for x in pe]
    if new.all():
        rotor_eff = (rotor[0][None, :], rotor[1][None, :])
    else:
        nm = jnp.asarray(new)[:, None]
        rotor_eff = (jnp.where(nm, rotor[0], f32(1.0)),
                     jnp.where(nm, rotor[1], f32(0.0)))
    c1 = []
    for c in range(ch):
        num = _pmul(rotor_eff, _pmulc(pi[c], prev_i[c]))
        den = jnp.maximum(pe_prev[c], pe[c]) + f32(NOISE_FLOOR)
        c1.append((num[0] / den, num[1] / den))

    # votes: static fractional shifts of the effective input (:744-786)
    ltf = (f32(longv) * tf).astype(f32)
    sd = [_pmap(lambda z: _interp_shift_static(z, tf), pi_c) for pi_c in
          [(ie[0][:, c], ie[1][:, c]) for c in range(ch)]]
    ld = [_pmap(lambda z: _interp_shift_static(z, ltf), pi_c) for pi_c in
          [(ie[0][:, c], ie[1][:, c]) for c in range(ch)]]

    mc = (jnp.zeros((nB, B), jnp.int32) if ch == 1 else
          jnp.argmax(jnp.stack(pe, 1), axis=1).astype(jnp.int32))

    b_idx = jnp.arange(B)

    def mask(z, cond):
        return _pmap(lambda x: jnp.where(cond, x, 0), z)

    # PRODUCT-FIRST vote build (round 5): every factor of each vote
    # coefficient is shifted by the same offset and selected with the same
    # mc[b], so the per-channel products are formed UNSHIFTED and a single
    # shift + select produces the coefficient — one plane materialization
    # per vote instead of three shifted operands + three selects each
    # (shift_up's concat is a full-plane copy; this cuts ~16 of them at
    # bench shapes).  Bit-identical: the float ops per bin are unchanged
    # (values at bin b come from bin b+shift either way), the shift's
    # zero-filled tail bins are exactly the bins the reference masks to
    # zero (b >= B-1 / B-longv, signalsmith-stretch.h:764-786), and
    # select-then-multiply == multiply-then-select under one mc.
    d1 = mask(_psel(mc, [_pmulc(pi[c], sd[c]) for c in range(ch)]),
              b_idx > 0)
    d2 = mask(_psel(mc, [_pmulc(pi[c], ld[c]) for c in range(ch)]),
              b_idx >= longv)

    # a = c1_up * conj(pi_up * conj(up_vote)) with every factor up-shifted
    t1 = [_pmulc(c1[c], _pmulc(pi[c], sd[c])) for c in range(ch)]
    t2 = [_pmulc(c1[c], _pmulc(pi[c], ld[c])) for c in range(ch)]
    a1 = mask(_psel(mc, [_pmap(lambda z: _shift_up(z, 1), t) for t in t1]),
              b_idx < B - 1)
    a2 = mask(_psel(mc, [_pmap(lambda z: _shift_up(z, longv), t)
                         for t in t2]),
              b_idx < B - longv)

    return SweepInputs(a1=a1, a2=a2, d1=d1, d2=d2, mc=mc,
                       pe=tuple(pe), pi=tuple(pi))


def plan_spectral(spectra: jnp.ndarray, prev_spectra: jnp.ndarray,
                  arrays: dict, controls: spectral.Controls,
                  flags: spectral.SpectralFlags,
                  consts: spectral.SpectralConsts, seed,
                  debug: bool = False,
                  with_violations: bool = False) -> SweepInputs:
    """spectra/prev_spectra [nB, ch, B] complex; arrays = schedule flags.

    With debug=True returns (SweepInputs, dict of per-block intermediates) so
    tests can compare the integrated planner's chains (energy, smoothing,
    output map, prediction energies) against the reference engine's internals
    as dumped by oracle/probe.cpp.

    With with_violations=True returns (SweepInputs, violations) where
    violations is a traced int32 count of windowed-interp / rank-table taps
    that fell outside their host-derived capacity windows and were zeroed.
    The host bounds are constructed so this is always 0; a nonzero count
    means a bound bug silently corrupted taps, so the engine surfaces it as
    a render diagnostic (VERDICT r2 hygiene: no silently-zeroed tap may
    ship a wrong render unnoticed).

    spectra/prev_spectra may each be an f32 (re, im) plane PAIR instead of
    complex64 (the TPU analysis emits pairs): the unmapped / formant-free /
    non-randomized case runs an all-pair tail (_plan_tail_pair), and every
    OTHER case (mapped, formants, randomized >2x) runs this main path in
    pair mode — the complex algebra below is written through tiny
    polymorphic helpers (cmul/cmulc/csel/...) that expand to f32-pair ops
    mirroring XLA's complex lowering, so no complex64 materializes between
    analysis and the sweep on the TPU path (round 5: the c64 interleave
    boundaries measured ~130 ms of the 552.7 ms mapped plan).  debug mode
    reconstitutes complex at entry (identical values — lax.complex is
    bit-transparent) so the probe dict keeps its c64 shape contract.
    """
    dbg = {}
    pair_in = isinstance(spectra, tuple)
    pairm = pair_in and not debug
    if pair_in:
        tf_pair = np.maximum(arrays["time_factor"],
                             f32(1.0 / MAX_CLEAN_STRETCH))
        if (not flags.mapped and not flags.process_formants and not debug
                and not bool((tf_pair > f32(MAX_CLEAN_STRETCH)).any())):
            result = _plan_tail_pair(spectra, prev_spectra, arrays, flags,
                                     consts, tf_pair)
            if with_violations:
                return result, jnp.int32(0)
            return result
        if not pairm:
            spectra = jax.lax.complex(*spectra)
            prev_spectra = jax.lax.complex(*prev_spectra)

    # polymorphic complex helpers: pair mode works on (re, im) f32 plane
    # tuples with exactly the ops XLA lowers complex arithmetic to; complex
    # mode keeps the original expressions (CPU probe bit-parity)
    if pairm:
        def cmap1(f, z):
            return (f(z[0]), f(z[1]))

        def cwhere(m, a, b):
            return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))

        def cwhere0(m, a):
            return (jnp.where(m, a[0], 0), jnp.where(m, a[1], 0))

        def cdivr(a, den):
            return (a[0] / den, a[1] / den)

        cmul, cmulc, csel = _pmul, _pmulc, _psel
    else:
        def cmap1(f, z):
            return f(z)

        def cwhere(m, a, b):
            return jnp.where(m, a, b)

        def cwhere0(m, a):
            return jnp.where(m, a, 0)

        def cdivr(a, den):
            return a / den

        def cmul(a, b):
            return a * b

        def cmulc(a, b):
            return a * jnp.conj(b)

        csel = _sel
    s_leaf = spectra[0] if pairm else spectra
    nB, ch, B = s_leaf.shape
    longv = consts.long_vertical_step
    new = arrays["new_spectrum"]          # numpy bool [nB]
    reanalyse = arrays["reanalyse"]
    tf_np = arrays["time_factor"]         # numpy f32 [nB]
    if pairm:
        rotor = (jnp.asarray(consts.rotor.real),
                 jnp.asarray(consts.rotor.imag))
    else:
        rotor = jnp.asarray(consts.rotor)     # [B] complex64

    # static time-factor facts (needed up front to size the interp windows)
    tf = np.maximum(tf_np, f32(1.0 / MAX_CLEAN_STRETCH))    # static [nB]
    any_random = bool((tf > f32(MAX_CLEAN_STRETCH)).any())

    # inv_grad_bound is None when the position slopes are unbounded on the
    # host side (custom frequency maps, or SST_INTERP_GRAD<=0): the windowed
    # interp's (C, L) capacity cannot be sized, and out-of-window taps would
    # be silently zeroed — fall back to the exact gather path instead.
    interp = None
    if (flags.mapped and _interp_mode() == "window"
            and flags.inv_grad_bound is not None):
        rand_extra = (float(longv) * 2.0
                      * max(0.0, float(tf.max()) - MAX_CLEAN_STRETCH)
                      if any_random else 0.0)
        # the vote positions share the prelim call's chunk windows (multi-set
        # call below): they sit up to longv*tf below input_bin, and the
        # random-regime up-shifted sets read input_bin[b+longv] (~1.5*g*longv
        # above the chunk's own spread)
        rand_extra += float(longv) * float(tf.max()) + 1.0
        if any_random:
            rand_extra += 1.5 * float(flags.inv_grad_bound) * float(longv)
        geom = _window_geometry(flags.inv_grad_bound, rand_extra)
        if geom is not None:
            interp = _WindowInterp(*geom)
    finterp_violations = jnp.int32(0)

    # Controls may carry per-block automation arrays ([nB] leaves) instead of
    # scalars — the TPU-native form of the worklet's schedule() automation.
    automated = jnp.ndim(controls.freq_multiplier) > 0
    if automated:
        ctrl_bb = spectral.Controls(*[c[:, None] for c in controls])  # [nB, 1]
    else:
        ctrl_bb = controls

    # ---- static input/prevInput chains (:332-376, 806-812) ----------------
    # all index vectors are compile-time numpy; degenerate patterns (uniform
    # fixed-rate renders: every block new, every block reanalysed) skip the
    # block gathers and selects entirely
    idx = np.arange(nB)
    src_input = np.maximum.accumulate(np.where(new, idx, -1))
    m_prev = np.empty(nB, np.int64)
    m_prev[0] = -1
    m_prev[1:] = src_input[:-1]           # last new block strictly before k

    if (src_input == idx).all():
        input_eff = spectra
    else:
        input_eff = cmap1(lambda z: z[np.maximum(src_input, 0)], spectra)
        input_eff = cwhere0(jnp.asarray((src_input >= 0))[:, None, None],
                            input_eff)

    if reanalyse.all():
        prev_base = prev_spectra
    else:
        base_idx = np.where(new & ~reanalyse, np.maximum(m_prev, 0),
                            np.maximum(src_input, 0))
        base_valid = np.where(new & ~reanalyse, m_prev >= 0, src_input >= 0)
        prev_base = cwhere(jnp.asarray(reanalyse)[:, None, None],
                           prev_spectra,
                           cmap1(lambda z: z[base_idx], spectra))
        prev_base = cwhere0(
            jnp.asarray(base_valid | reanalyse)[:, None, None], prev_base)
    if new.all():
        prev_eff = cmul(prev_base, rotor)
    else:
        prev_eff = cwhere(jnp.asarray(new)[:, None, None],
                          cmul(prev_base, rotor), prev_base)

    if pairm:
        in_energy = input_eff[0] ** 2 + input_eff[1] ** 2   # [nB, ch, B]
    else:
        in_energy = input_eff.real ** 2 + input_eff.imag ** 2
    b_f = jnp.arange(B, dtype=jnp.float32)

    # ---- smoothing + peaks + output map (:816-917) ------------------------
    if flags.mapped:
        energy = jnp.sum(in_energy, axis=1)                 # [nB, B]
        sm = energy
        e = jnp.zeros(nB, jnp.float32)
        for _ in range(2):
            sm, e = scan_ops.iir_backward(sm, e, f32(consts.slew))
            sm, e = scan_ops.iir_forward(sm, e, f32(consts.slew))

        def pm(en, smo, ctl):
            return spectral._peaks_and_map(en, smo, ctl, flags, consts)

        if interp is not None:
            input_bin, freq_grad, pm_bad = _peaks_and_map_batched(
                energy, sm, ctrl_bb, flags, consts, (interp.C, interp.L))
            interp.violations = interp.violations + pm_bad
        elif automated:
            input_bin, freq_grad = jax.vmap(pm)(energy, sm, controls)
        else:
            input_bin, freq_grad = jax.vmap(
                lambda e, s: pm(e, s, controls))(energy, sm)  # [nB, B]
        if debug:
            dbg.update(energy=energy, smoothed=sm, input_bin=input_bin,
                       freq_grad=freq_grad)
    else:
        input_bin, freq_grad = None, None   # identity map, no gathers needed

    # ---- formants (:970-1036) ---------------------------------------------
    if flags.process_formants:
        metric = jnp.sum(in_energy, axis=1)                 # [nB, B]
        if flags.formant_auto:
            pe_est, weight = spectral._peak_estimate(
                *spectral._top3_local_maxima(metric))       # [nB]
            # freqEstimateWeighted chain over blocks (:962-965)
            few, _ = scan_ops.iir_forward(
                (pe_est.astype(jnp.float32) * weight)[None, :],
                jnp.float32(0), f32(0.25))
            fw, _ = scan_ops.iir_forward(weight[None, :], jnp.float32(0),
                                         f32(0.25))
            est = few[0] / (fw[0] + f32(1e-30))
            use_base = controls.formant_base_freq > 0
            freq_estimate = jnp.where(
                use_base,
                spectral._freq_to_band(controls.formant_base_freq, consts),
                est)
        else:
            freq_estimate = jnp.broadcast_to(
                spectral._freq_to_band(controls.formant_base_freq, consts),
                (nB,))
        if debug and flags.formant_auto:
            dbg.update(freq_estimate_weighted=few[0], freq_weight=fw[0])

        decay = f32(1) - f32(1) / (freq_estimate * f32(0.5) + f32(1))  # [nB]
        env = metric
        e = jnp.zeros(nB, jnp.float32)
        for _ in range(2):
            env, e = scan_ops.decay_max_backward(env, e, decay)
            env, e = scan_ops.decay_max_forward(env, e, decay)
        inv_decay = f32(1) / decay
        for _ in range(2):
            env, e = scan_ops.decay_min_backward(env, e, inv_decay)
            env, e = scan_ops.decay_min_forward(env, e, inv_decay)

        env_pad = jnp.concatenate([env, jnp.zeros((nB, 128), env.dtype)], -1)
        input_f = jnp.asarray(consts.band_freq)
        output_f = (spectral.map_freq(input_f, ctrl_bb, flags)
                    if flags.formant_compensation else input_f)
        output_f = spectral.inv_map_formant(output_f, ctrl_bb)
        target_band = spectral._freq_to_band(output_f, consts)  # [B] or [nB, B]
        tb = jnp.minimum(target_band, f32(B))
        finterp = None
        if _interp_mode() == "window" and flags.inv_grad_bound is not None:
            geom_f = _window_geometry(flags.inv_grad_bound, 0.0)
            if geom_f is not None:
                finterp = _WindowInterp(*geom_f)
        if finterp is not None:
            # windowed selection over env_pad (width B+128, zeros at indices
            # B..B+127) is bit-identical to the clipped take: any clipped
            # index lands on env[0] (then forced to 0 by the target_band<0
            # mask) or on the zero pad (see _interp_mode).
            tbb = jnp.broadcast_to(tb, (nB, B))
            (env_v,) = finterp([env_pad], tbb)
            target_e = jnp.where(target_band < 0, f32(0), env_v)
            finterp_violations = finterp.violations
        else:
            floor_band = jnp.floor(tb).astype(jnp.int32)
            frac = tb - floor_band.astype(jnp.float32)
            if floor_band.ndim == 1:
                lo = jnp.take(env_pad, jnp.clip(floor_band, 0, B + 1), axis=-1)
                hi = jnp.take(env_pad, jnp.clip(floor_band + 1, 0, B + 1),
                              axis=-1)
            else:
                lo = jnp.take_along_axis(env_pad,
                                         jnp.clip(floor_band, 0, B + 1), -1)
                hi = jnp.take_along_axis(env_pad,
                                         jnp.clip(floor_band + 1, 0, B + 1), -1)
            target_e = jnp.where(target_band < 0, f32(0),
                                 lo + (hi - lo) * frac)
        ratio = target_e / (env + f32(1e-30))               # [nB, B]
        in_energy = in_energy * ratio[:, None, :]

    # ---- random binTimeFactors (:747-757), needed for vote positions -----
    tf_j = jnp.asarray(tf)
    if any_random:
        random_tf = jnp.asarray(tf > f32(MAX_CLEAN_STRETCH))
        lo_d = f32(MAX_CLEAN_STRETCH) * 2 * random_tf.astype(jnp.float32) - tf_j
        key = jax.random.PRNGKey(seed)
        draws = spectral.draw_uniform(flags, key, (2, nB, B),
                                      lo_d[None, :, None],
                                      tf_j[None, :, None])
        btf1 = jnp.where(random_tf[:, None], draws[0], tf_j[:, None])
        btf2 = jnp.where(random_tf[:, None], draws[1], tf_j[:, None])
    else:
        btf1 = btf2 = None   # uniform per-block shift == tf

    # ---- preliminary-prediction constants (:697-719) ----------------------
    vote_vals = None
    if flags.mapped:
        pos_grad = jnp.maximum(f32(0), freq_grad)
        if interp is not None:
            # ONE shared-window multi-set call covers the prelim lookups AND
            # the vote positions (all within longv*tf of input_bin, which the
            # geometry margin includes): the plane padding and window
            # extraction — ~70% of a call at bench shapes — are paid once.
            if pairm:
                # planar f32 rows: 2 planes per complex row, paired back up
                # below (the interp splits complex rows into exactly these
                # planes internally, so the windowed math is unchanged)
                rows = []
                for z in (input_eff, prev_eff):
                    for c in range(ch):
                        rows += [z[0][:, c], z[1][:, c]]
                rows += [in_energy[:, c] for c in range(ch)]
            else:
                rows = ([input_eff[:, c] for c in range(ch)]
                        + [prev_eff[:, c] for c in range(ch)]
                        + [in_energy[:, c] for c in range(ch)])
            n_main = 5 * ch if pairm else 3 * ch
            n_vote = 2 * ch if pairm else ch
            base = input_bin
            if any_random:
                # _shift_up zero-fills the last k positions; those votes are
                # masked out of a1/a2 below, but a zero position would drag
                # the tail chunk's window anchor away from its real
                # positions -- use the (equally masked) unshifted value as an
                # in-range sentinel.
                bi = jnp.arange(B)[None, :]
                base_up1 = jnp.where(bi < B - 1, _shift_up(base, 1), base)
                base_upl = jnp.where(bi < B - longv, _shift_up(base, longv),
                                     base)
                specs = [(base, n_main), (base - btf1, n_vote),
                         (base - f32(longv) * btf1, n_vote),
                         (base_up1 - btf2, n_vote),
                         (base_upl - f32(longv) * btf2, n_vote)]
            else:
                specs = [(base, n_main), (base - tf_j[:, None], n_vote),
                         (base - f32(longv) * tf_j[:, None], n_vote)]
            outs = interp.multi(rows, specs)
            vals = outs[0]
            if pairm:
                vote_vals = [[(v[2 * c], v[2 * c + 1]) for c in range(ch)]
                             for v in outs[1:]]
                pi = [(vals[2 * c], vals[2 * c + 1]) for c in range(ch)]
                prev_i = [(vals[2 * ch + 2 * c], vals[2 * ch + 2 * c + 1])
                          for c in range(ch)]
                pe = [vals[4 * ch + c] * pos_grad for c in range(ch)]
            else:
                vote_vals = outs[1:]
                pi = [vals[c] for c in range(ch)]
                prev_i = [vals[ch + c] for c in range(ch)]
                pe = [vals[2 * ch + c] * pos_grad for c in range(ch)]
        else:
            pe = [_interp_gather(in_energy[:, c], input_bin) * pos_grad
                  for c in range(ch)]
            pi = [cmap1(lambda z, c=c: _interp_gather(z[:, c], input_bin),
                        input_eff) for c in range(ch)]
            prev_i = [cmap1(lambda z, c=c: _interp_gather(z[:, c], input_bin),
                            prev_eff) for c in range(ch)]
    else:
        pe = [in_energy[:, c] for c in range(ch)]
        pi = [cmap1(lambda z, c=c: z[:, c], input_eff) for c in range(ch)]
        prev_i = [cmap1(lambda z, c=c: z[:, c], prev_eff) for c in range(ch)]

    pe_prev = [jnp.concatenate([jnp.zeros((1, B), x.dtype), x[:-1]], 0)
               for x in pe]
    if pairm:
        if new.all():
            rotor_eff = (rotor[0][None, :], rotor[1][None, :])
        else:
            nm = jnp.asarray(new)[:, None]
            rotor_eff = (jnp.where(nm, rotor[0], f32(1.0)),
                         jnp.where(nm, rotor[1], f32(0.0)))
    elif new.all():
        rotor_eff = rotor[None, :]
    else:
        rotor_eff = jnp.where(jnp.asarray(new)[:, None], rotor,
                              jnp.ones((), rotor.dtype))    # [nB, B]
    c1 = [cdivr(cmul(rotor_eff, cmulc(pi[c], prev_i[c])),
                jnp.maximum(pe_prev[c], pe[c]) + f32(NOISE_FLOOR))
          for c in range(ch)]

    # ---- main-prediction coefficients (:722-803) --------------------------
    mc = jnp.argmax(jnp.stack(pe, 1), axis=1).astype(jnp.int32)  # [nB, B]
    pi_max = csel(mc, pi)

    margin = int(np.ceil(longv * float(tf.max()))) + 2

    def vote_gathers(z):
        """z [nB, B] (complex or pair) -> (short/long down, up short/long)."""
        base = input_bin if flags.mapped else b_f[None, :]
        if any_random:
            sd = cmap1(lambda x: _interp_gather(x, base - btf1), z)
            ld = cmap1(lambda x: _interp_gather(x, base - f32(longv) * btf1),
                       z)
            us = cmap1(lambda x: _interp_gather(x, _shift_up(base, 1) - btf2),
                       z)
            ul = cmap1(lambda x: _interp_gather(
                x, _shift_up(base, longv) - f32(longv) * btf2), z)
            return sd, ld, us, ul
        if flags.mapped:
            sd = cmap1(lambda x: _interp_gather(x, base - tf_j[:, None]), z)
            ld = cmap1(lambda x: _interp_gather(
                x, base - f32(longv) * tf_j[:, None]), z)
        else:
            sd = cmap1(lambda x: _interp_shift_static(x, tf), z)
            ld = cmap1(lambda x: _interp_shift_static(
                x, (f32(longv) * tf).astype(f32)), z)
        # same binTimeFactor in both vote branches => up positions are the
        # down positions shifted one (or longv) bins up (:764-786)
        us = cmap1(lambda x: _shift_up(x, 1), sd)
        ul = cmap1(lambda x: _shift_up(x, longv), ld)
        return sd, ld, us, ul

    if vote_vals is not None:
        if any_random:
            sd, ld, us, ul = vote_vals
        else:
            sd, ld = vote_vals
            us = [cmap1(lambda x: _shift_up(x, 1), v) for v in sd]
            ul = [cmap1(lambda x: _shift_up(x, longv), v) for v in ld]
        if debug:
            dbg["interp_violations"] = interp.violations + finterp_violations
    else:
        sd = [None] * ch
        ld = [None] * ch
        us = [None] * ch
        ul = [None] * ch
        for c in range(ch):
            sd[c], ld[c], us[c], ul[c] = vote_gathers(
                cmap1(lambda z, c=c: z[:, c], input_eff))
    short_down = csel(mc, sd)
    long_down = csel(mc, ld)
    up_short = csel(mc, us)
    up_long = csel(mc, ul)

    d1 = cmulc(pi_max, short_down)
    d2 = cmulc(pi_max, long_down)
    b_idx = jnp.arange(B)
    d1 = cwhere0(b_idx > 0, d1)
    d2 = cwhere0(b_idx >= longv, d2)

    pi_up1 = csel(mc, [cmap1(lambda x: _shift_up(x, 1), pi[c])
                       for c in range(ch)])
    pi_upl = csel(mc, [cmap1(lambda x: _shift_up(x, longv), pi[c])
                       for c in range(ch)])
    c1_up1 = csel(mc, [cmap1(lambda x: _shift_up(x, 1), c1[c])
                       for c in range(ch)])
    c1_upl = csel(mc, [cmap1(lambda x: _shift_up(x, longv), c1[c])
                       for c in range(ch)])
    a1 = cmulc(c1_up1, cmulc(pi_up1, up_short))
    a2 = cmulc(c1_upl, cmulc(pi_upl, up_long))
    a1 = cwhere0(b_idx < B - 1, a1)
    a2 = cwhere0(b_idx < B - longv, a2)

    result = SweepInputs(a1=a1, a2=a2, d1=d1, d2=d2, mc=mc,
                         pe=tuple(pe), pi=tuple(pi))
    if debug:
        dbg["pe"] = jnp.stack(pe, axis=1)              # [nB, ch, B]
        return result, dbg
    if with_violations:
        total = finterp_violations
        if interp is not None:
            total = total + interp.violations
        return result, total
    return result


def _shift_up(x, n):
    """x[..., b] -> x[..., b+n] (zeros beyond the end)."""
    return jnp.concatenate(
        [x[..., n:], jnp.zeros(x.shape[:-1] + (n,), x.dtype)], -1)


# ---------------------------------------------------------------------------
# The diagonal sweep
# ---------------------------------------------------------------------------
def _make_output(pe, pi, phase):
    pn = phase.real ** 2 + phase.imag ** 2
    weak = pn <= f32(NOISE_FLOOR)
    fn = pi.real ** 2 + pi.imag ** 2
    phase2 = jnp.where(weak, pi, phase)
    pn2 = jnp.where(weak, fn + f32(NOISE_FLOOR), pn)
    return phase2 * jnp.sqrt(pe / pn2)


def _make_output_pair(pe, pir, pii, phr, phi):
    """_make_output on f32 real/imag pairs (same op order)."""
    pn = phr * phr + phi * phi
    weak = pn <= f32(NOISE_FLOOR)
    fn = pir * pir + pii * pii
    p2r = jnp.where(weak, pir, phr)
    p2i = jnp.where(weak, pii, phi)
    pn2 = jnp.where(weak, fn + f32(NOISE_FLOOR), pn)
    s = jnp.sqrt(pe / pn2)
    return p2r * s, p2i * s


def spectral_all_blocks(spectra, prev_spectra, arrays, controls, flags,
                        consts, seed, pair_out: bool = False,
                        with_diag: bool = False):
    """Full planned pipeline: [nB, ch, B] spectra -> [ch, nB, B] outputs
    (channels-major: the synthesis/OLA stages consume that layout with no
    relayout).  With pair_out=True returns (re, im) f32 planes instead of
    complex64 — the sweep computes f32 pairs internally, so this skips the
    interleaved-c64 materialization at the stage boundary (the synthesis
    matmul iDFT consumes the planes directly).  With with_diag=True also
    returns the planner's interp-violation count (see plan_spectral)."""
    viol = None
    if with_diag:
        inputs, viol = plan_spectral(spectra, prev_spectra, arrays, controls,
                                     flags, consts, seed,
                                     with_violations=True)
    else:
        inputs = plan_spectral(spectra, prev_spectra, arrays, controls,
                               flags, consts, seed)
    longv = consts.long_vertical_step
    step = longv + 1
    nB = (inputs.a1[0] if isinstance(inputs.a1, tuple)
          else inputs.a1).shape[0]

    # pe is bit-identical to |pi|^2 whenever the identity map fed the
    # prediction stage (pe = in_energy = re^2+im^2 of input_eff, computed
    # with the same float32 ops) — recompute it in-cell and drop 2 planes
    # from the streamed xs
    pe_from_pi = not flags.mapped and not flags.process_formants
    ch = len(inputs.pe)
    # smaller unroll on CPU: results are K-invariant (the cell chain is
    # identical), but the K-unrolled scan body dominates LLVM compile time
    default_k = "32" if jax.default_backend() != "cpu" else "8"
    unroll = int(os.environ.get("SST_SWEEP_UNROLL", default_k))
    if flags.mapped or flags.process_formants:
        # cut layout propagation from the sweep's packed layouts back into
        # the planner: without this barrier XLA relayouts the windowed
        # interp's padded planes to an n-minor layout whose lane padding
        # needs ~18 GB at mapped bench shapes (values are unchanged)
        inputs = jax.lax.optimization_barrier(inputs)
    fn = _sweep_unskew_fn(longv, ch, pe_from_pi, consts.bands, unroll,
                          pair_out)
    out = fn(inputs)                               # [ch, nB, B]
    if with_diag:
        return out, viol
    return out


@functools.lru_cache(maxsize=None)
def _sweep_unskew_fn(longv: int, ch: int, pe_from_pi: bool, bands: int,
                     unroll: int = 32, pair_out: bool = False):
    """custom_vmap'd (sweep + unskew): per-clip signature
    SweepInputs([nB, B] leaves) -> [nB, ch, bands], with the batched rule
    running one explicitly batched program whose layouts are chosen by hand.

    LANE ALIGNMENT IS EVERYTHING here: an xs whose minor dimension is not a
    multiple of 128 streams through lax.scan at ~6 GB/s on TPU (the padded
    tiles defeat the DMA path); the same data 128-aligned streams at
    ~550 GB/s — measured 90x.  The block-row count nB is therefore
    zero-padded to a 128 multiple, the diagonal count D to a multiple of
    lcm(K, 128), and the scan xs is laid out [S, K, P, batch, rows] so every
    per-cell plane slice row[j, p] is one contiguous [batch, rows] tile
    (under plain vmap the batch axis lands between S and K, which strides
    every plane slice across P and costs ~2x).  Padded rows carry all-zero
    planes, which propagate exact zeros through the cell (pe=0 forces the
    weak-phase branch of _make_output to 0*sqrt(0/floor)=0); valid rows
    never read them (the only same-diagonal coupling is shift_k, reading
    row k-1 < nB).

    ROW-GROUP TILING (SST_SWEEP_GROUP, default 128 on TPU): the skewed
    diagonal extent D = B + (rows-1)*step makes xs bytes grow ~rows^2 for
    the zero-padded wings; sweeping in groups of GR rows cuts xs to
    rows*(B + (GR-1)*step) (~65% at bench shapes for GR=128).  Groups run
    sequentially inside the jit; the one cross-group dependency — lane 0 of
    a group reads row (g*GR - 1)'s outputs at bins t+1 / t+longv — is
    injected into the k-shift as two extra [K, ch, batch] xs planes sliced
    from the previous group's unskewed last row.  Values are bit-identical
    to the monolithic sweep: the injected values are exactly what shift_k
    read from the neighbouring lane.

    Other layout notes:
      - all planes pack into one [batch, P, nB, B] array; XLA fuses the
        stack into the plane producers,
      - the skew is a row-scan DUS-placing each block row at its diagonal
        offset (contiguous byte-offset DMA) plus one aligned transpose —
        3x faster than a pad-flatten-reshape pitch merge, whose unaligned
        row pitch forces a lane-rotation relayout,
      - for <=2 channels the max-channel plane is recomputed in-register
        from the prediction energies (argmax over 2),
      - pe planes are dropped from the xs and recomputed as |pi|^2 in-cell
        when pe_from_pi (bit-identical for unmapped, formant-free configs).
    """
    from jax import custom_batching

    step = longv + 1
    K = unroll
    carry_mc = ch > 2

    def _pair_mode() -> bool:
        """f32-pair cell math (real/imag planes) instead of complex64.

        XLA's complex arithmetic on TPU materializes interleaved
        real/imag pairs at fusion boundaries (the scan carry, the ys
        emission), paying a de/re-interleave relayout every step; keeping
        the whole sweep in f32 planes avoids it.  The pair ops mirror the
        complex lowering exactly (mulr = ar*br - ai*bi, ...), with the
        same operand/addition order; CPU keeps the complex path so probe
        bit-parity is measured against one canonical lowering, and the
        pair/complex equivalence is gated by tests/test_wavefront.py.
        Override: SST_SWEEP_PAIR=0/1.
        """
        env = (os.environ.get("SST_SWEEP_PAIR") or "").strip()
        if env:
            return env != "0"
        return jax.default_backend() != "cpu"

    def batched_impl(inp: SweepInputs):
        pair = _pair_mode()
        pair_leaves = isinstance(inp.a1, tuple)
        if pair_leaves and not pair:
            # pair planner output but a complex-cell sweep (CPU override):
            # reconstitute complex leaves (bit-transparent)
            inp = SweepInputs(
                a1=jax.lax.complex(*inp.a1), a2=jax.lax.complex(*inp.a2),
                d1=jax.lax.complex(*inp.d1), d2=jax.lax.complex(*inp.d2),
                mc=inp.mc, pe=inp.pe,
                pi=tuple(jax.lax.complex(*p) for p in inp.pi))
            pair_leaves = False

        def _ri(z):
            return z if isinstance(z, tuple) else (z.real, z.imag)

        a1_leaf = inp.a1[0] if pair_leaves else inp.a1
        batch, nB, B = a1_leaf.shape
        nBp = -(-nB // 128) * 128
        align = K * 128 // np.gcd(K, 128)
        on_cpu = jax.default_backend() == "cpu"
        gr_env = os.environ.get("SST_SWEEP_GROUP", "" if on_cpu else "128")
        GR = int(gr_env) if gr_env else nBp
        GR = min(GR, nBp)
        if nBp % GR:
            GR = nBp

        arrs = []
        for name in ("a1", "a2", "d1", "d2"):
            arrs += list(_ri(getattr(inp, name)))
        if carry_mc:
            arrs.append(inp.mc.astype(jnp.float32))
        if not pe_from_pi:
            for c in range(ch):
                arrs.append(inp.pe[c])
        for c in range(ch):
            arrs += list(_ri(inp.pi[c]))
        P = len(arrs)
        # SST_SWEEP_PACK=fuse skips materializing the packed [batch, P,
        # nBp, B] array: the static skew builds each group's frames straight
        # from the P plan planes.  MEASURED REJECTION (round 5, bench
        # shapes): full render 256.9 ms vs 249.3 ms for "stack" plus a 501 s
        # compile — the 512 per-row plane slices defeat XLA's bulk-copy
        # lowering of the skew, costing more than the pack's 3.2 GB
        # write+read saves.  Default "stack" on all backends.
        pack_env = os.environ.get("SST_SWEEP_PACK") or "stack"
        if pack_env not in ("stack", "fuse"):
            raise ValueError("SST_SWEEP_PACK must be stack or fuse, got %r"
                             % pack_env)
        packed = None
        if pack_env == "stack":
            packed = jnp.pad(jnp.stack(arrs, axis=1),
                             ((0, 0), (0, 0), (0, nBp - nB), (0, 0)))
        # profiling-only early exit (tools/exp_sweep_prefix.py): truncate the
        # pipeline after a phase so its cost can be attributed by difference.
        # Never set in production; outputs are NOT render outputs.  The
        # barrier forces the intermediate to materialize (the checksum alone
        # would fuse into the producers and skip the write), and the [batch]
        # checksum keeps the custom_vmap output contract (batch-leading).
        stop = os.environ.get("SST_SWEEP_STOP", "")

        def _stop_sum(x, batch_axis):
            x = jax.lax.optimization_barrier(x)
            axes = tuple(a for a in range(x.ndim) if a != batch_axis)
            return jnp.sum(jnp.abs(x), axis=axes)

        if stop == "pack":
            if packed is None:
                packed = jnp.pad(jnp.stack(arrs, axis=1),
                                 ((0, 0), (0, 0), (0, nBp - nB), (0, 0)))
            return _stop_sum(packed, 0)

        def build_sk(g0, rows_n, D):
            """CPU skew for rows [g0, g0+rows_n): [D, P, batch, rows_n].
            Pad-flatten-reshape pitch merge — a plain memcpy on CPU (no lane
            tiling; the TPU path's unrolled DUS row-scan makes LLVM compile
            for tens of minutes).  Row r sits at offset r*step."""
            T = D + step
            grp = packed[:, :, g0:g0 + rows_n]
            xp = jnp.pad(grp, ((0, 0), (0, 0), (0, 0), (0, T - B)))
            flat = xp.reshape(batch, P, rows_n * T)
            sk = flat[:, :, :rows_n * (T - step)].reshape(
                batch, P, rows_n, D)
            return jnp.transpose(sk, (3, 1, 0, 2))

        def unpack(row):
            """row [K, P, batch, rows] -> planes [K, batch, rows]."""
            C = jax.lax.complex
            i = [0]

            def take():
                v = row[:, i[0]]
                i[0] += 1
                return v

            a1 = C(take(), take())
            a2 = C(take(), take())
            d1 = C(take(), take())
            d2 = C(take(), take())
            mc = take().astype(jnp.int32) if carry_mc else None
            if pe_from_pi:
                pi = tuple(C(take(), take()) for _ in range(ch))
                pe = tuple(p.real * p.real + p.imag * p.imag for p in pi)
            else:
                pe = tuple(take() for _ in range(ch))
                pi = tuple(C(take(), take()) for _ in range(ch))
            if not carry_mc:
                # argmax over <=2 channels, first-wins on ties (:722)
                mc = (jnp.zeros(pe[0].shape, jnp.int32) if ch == 1
                      else (pe[1] > pe[0]).astype(jnp.int32))
            return SweepInputs(a1=a1, a2=a2, d1=d1, d2=d2, mc=mc,
                               pe=pe, pi=pi)

        def unpack_pair(row):
            """row [K, P, batch, rows] -> stacked f32 views (no copies):
            V [K, 4, 2, b, r] vote coefficients (a1, a2, d1, d2), optional
            mc [K, b, r], PE [K, ch, b, r], PI [K, ch, 2, b, r].  Same
            plane order as unpack (the xs build is shared)."""
            o = 8
            V = row[:, :8].reshape(K, 4, 2, batch, -1)
            mc = None
            if carry_mc:
                mc = row[:, o].astype(jnp.int32)
                o += 1
            if pe_from_pi:
                PI = row[:, o:o + 2 * ch].reshape(K, ch, 2, batch, -1)
                PE = PI[:, :, 0] * PI[:, :, 0] + PI[:, :, 1] * PI[:, :, 1]
            else:
                PE = row[:, o:o + ch]
                o += ch
                PI = row[:, o:o + 2 * ch].reshape(K, ch, 2, batch, -1)
            return V, mc, PE, PI

        def shift_k(x, inj):
            head = (jnp.zeros(x.shape[:-1] + (1,), x.dtype) if inj is None
                    else inj[..., None])
            return jnp.concatenate([head, x[..., :-1]], -1)

        def cell_pair(ring_list, x, j, ij):
            """cell on STACKED f32 planes; ring entries are [ch, 2, b, r]
            arrays.  One shift-concat and a handful of channel selects per
            cell (the per-plane formulation fragmented the scan body into
            ~11 XLA fusions per cell — each a kernel with its own HBM
            round trip).  Values match the complex cell to the
            fma-contraction level (sum order of the four votes is the
            only reassociation: a tree instead of sequential)."""
            V, mcp, PE, PI = x
            prevl = ring_list[0]                    # [ch, 2, b, r]
            prev1 = ring_list[-1]
            pe = PE[j]                              # [ch, b, r]
            pi = PI[j]                              # [ch, 2, b, r]
            if carry_mc:
                mc = mcp[j]

                def sel(X, axis_ch=0):
                    out = jnp.take(X, 0, axis_ch)
                    for c in range(1, ch):
                        out = jnp.where(mc == c, jnp.take(X, c, axis_ch),
                                        out)
                    return out
            elif ch == 1:
                def sel(X, axis_ch=0):
                    return jnp.take(X, 0, axis_ch)
            else:
                mc1 = pe[1] > pe[0]                 # argmax, first wins

                def sel(X, axis_ch=0):
                    return jnp.where(mc1, jnp.take(X, 1, axis_ch),
                                     jnp.take(X, 0, axis_ch))

            both = jnp.stack([prevl, prev1])        # [2, ch, 2, b, r]
            # lane-0 injection head + one shift for all planes at once
            sh = jnp.concatenate([ij[j][..., None], both[..., :-1]], -1)
            # votes (a1, a2, d1, d2) pair with (sh(prevl), sh(prev1),
            # prev1, prevl); select the max channel of each
            cat = jnp.stack([sh[0], sh[1], both[1], both[0]])
            W = sel(cat, 1)                         # [4, 2, b, r]
            Pr = V[j, :, 0] * W[:, 0] - V[j, :, 1] * W[:, 1]
            Pi = V[j, :, 0] * W[:, 1] + V[j, :, 1] * W[:, 0]
            phr = ((Pr[0] + Pr[1]) + Pr[2]) + Pr[3]
            phi = ((Pi[0] + Pi[1]) + Pi[2]) + Pi[3]
            pe_m = sel(pe)
            pim = sel(pi)                           # [2, b, r]
            omr, omi = _make_output_pair(pe_m, pim[0], pim[1], phr, phi)
            om = jnp.stack([omr, omi])              # [2, b, r]
            if ch == 1:
                return om[None]
            # locked channels, vectorized over ch:
            # ct = pi_c * conj(pi_max); locked = makeOutput(out_main * ct)
            ctr = pi[:, 0] * pim[0] + pi[:, 1] * pim[1]
            cti = pi[:, 1] * pim[0] - pi[:, 0] * pim[1]
            tr = omr * ctr - omi * cti
            ti = omr * cti + omi * ctr
            lr, li = _make_output_pair(pe, pi[:, 0], pi[:, 1], tr, ti)
            lk = jnp.stack([lr, li], 1)             # [ch, 2, b, r]
            if carry_mc:
                mask = (jnp.arange(ch, dtype=jnp.int32)[:, None, None, None]
                        == mc[None, None])          # [ch, 1, b, r]
            else:
                mask = jnp.stack([~mc1, mc1])[:, None]
            return jnp.where(mask, om[None], lk)    # [ch, 2, b, r]

        def cell(ring_list, x, j, inj1, injl):
            """ring_list: newest-last python list of [ch][batch, rows]."""
            mc = x.mc[j]
            prev1 = [ring_list[-1][c] for c in range(ch)]
            prevl = [ring_list[0][c] for c in range(ch)]
            down1 = _sel(mc, prev1)
            downl = _sel(mc, prevl)
            up1 = _sel(mc, [shift_k(prevl[c],
                                    None if inj1 is None else inj1[c])
                            for c in range(ch)])
            upl = _sel(mc, [shift_k(prev1[c],
                                    None if injl is None else injl[c])
                            for c in range(ch)])
            phase = (x.d1[j] * down1 + x.d2[j] * downl
                     + x.a1[j] * up1 + x.a2[j] * upl)
            pe_max = _sel(mc, [x.pe[c][j] for c in range(ch)])
            pi_max = _sel(mc, [x.pi[c][j] for c in range(ch)])
            out_main = _make_output(pe_max, pi_max, phase)
            outs = []
            for c in range(ch):
                ct = x.pi[c][j] * jnp.conj(pi_max)
                locked = _make_output(x.pe[c][j], x.pi[c][j], out_main * ct)
                outs.append(jnp.where(mc == c, out_main, locked))
            return outs

        nch = 2 * ch if pair else ch    # output "channel" planes per bin

        # Emission strategy (SST_SWEEP_EMIT): the scan's stacked-ys output is
        # [D, nch, batch, GR] (diagonal-major); the downstream stages need
        # bands-MINOR, and the global (1,2,3,0) transpose moving D to the
        # minor dim measured ~50 ms at bench shapes (tools/exp_sweep_pieces:
        # it is the single most expensive piece of the sweep).  "dus" emits
        # each step's [K] diagonal window straight into a [nch, batch, GR, D]
        # scan-carry buffer via lane-offset dynamic_update_slice (in-place:
        # the carry aliases through the while loop), so the unskew becomes a
        # free reshape-view.  Values are bit-identical — pure data movement.
        # CPU keeps "scan": LLVM compiles the windowed DUS loop poorly and
        # the transpose is cheap there.
        emit_mode = os.environ.get("SST_SWEEP_EMIT") or ("scan" if on_cpu
                                                         else "dus")
        if emit_mode not in ("scan", "dus"):
            raise ValueError("SST_SWEEP_EMIT must be scan or dus, got %r"
                             % emit_mode)

        def run_group(xs, rows_n, inj, D):
            """inj: [S, K, 2, ch, batch] complex lane-0 injections
            (pair mode: [S, K, 2, ch, 2, batch] f32).
            Returns [batch, nch, rows_n, D] (dus) or [D, ...] ys (scan).
            BATCH-MAJOR, RI-MAJOR EMISSION (round 5): the emitted plane
            index is ri*ch + c (pair mode) and batch leads, so the final
            output buffer IS the custom_vmap result layout — the (re, im)
            halves are contiguous axis-1 views and no post-sweep stack /
            major transpose / strided de-interleave pass exists (those
            three passes measured ~30 ms of round 4's 44.6 ms
            unskew+transpose, tools/exp_sweep_pieces.py)."""
            dus = emit_mode == "dus"

            def body(carry, xy):
                ring, buf = carry if dus else (carry, None)
                if dus:
                    row, ij, joff = xy
                else:
                    row, ij = xy
                if pair:
                    x = unpack_pair(row)
                    ring_list = [ring[l] for l in range(longv)]
                    emitted = []
                    for j in range(K):
                        outs = cell_pair(ring_list, x, j, ij)
                        ring_list = ring_list[1:] + [outs]
                        emitted.append(outs)
                    ring2 = jnp.stack(ring_list, 0)
                    em = jnp.stack(emitted, 0)      # [K, ch, 2, batch, rows]
                    # ri-major plane order: nch index = ri*ch + c
                    em_f = jnp.transpose(em, (0, 2, 1, 3, 4)).reshape(
                        K, nch, batch, rows_n)
                else:
                    x = unpack(row)
                    ring_list = [[ring[l, c] for c in range(ch)]
                                 for l in range(longv)]
                    emitted = []
                    for j in range(K):
                        inj1 = [ij[j, 0, c] for c in range(ch)]
                        injl_ = [ij[j, 1, c] for c in range(ch)]
                        outs = cell(ring_list, x, j, inj1, injl_)
                        ring_list = ring_list[1:] + [outs]
                        emitted.append(jnp.stack(outs, axis=0))
                    ring2 = jnp.stack([jnp.stack(r, 0) for r in ring_list], 0)
                    em_f = jnp.stack(emitted, axis=0)  # [K, ch, batch, rows]
                if not dus:
                    return ring2, em_f
                win = jnp.transpose(em_f, (2, 1, 3, 0))  # [b,nch,rows,K]
                buf2 = jax.lax.dynamic_update_slice(buf, win, (0, 0, 0, joff))
                return (ring2, buf2), None

            if pair:
                ring0 = jnp.zeros((longv, ch, 2, batch, rows_n), jnp.float32)
            else:
                ring0 = jnp.zeros((longv, ch, batch, rows_n), a1_leaf.dtype)
            if dus:
                buf0 = jnp.zeros((batch, nch, rows_n, D),
                                 jnp.float32 if pair else a1_leaf.dtype)
                offs = jnp.arange(D // K, dtype=jnp.int32) * K
                (_, buf), _ = jax.lax.scan(body, (ring0, buf0),
                                           (xs, inj, offs))
                return buf
            _, outs = jax.lax.scan(body, ring0, (xs, inj))
            return outs

        def unskew_group(skc, rows_n, D):
            """[batch, nch, rows_n, D] -> [batch, nch, rows_n, bands]."""
            flat = skc.reshape(batch, nch, rows_n * D)
            tail = jnp.zeros((batch, nch, rows_n * step), skc.dtype)
            view = jnp.concatenate([flat, tail], 2).reshape(
                batch, nch, rows_n, D + step)
            return view[..., :bands]

        nG = nBp // GR
        D = -(-(B + (GR - 1) * step) // align) * align

        skew_mode = os.environ.get("SST_SKEW") or ("merge" if on_cpu
                                                   else "static")
        if skew_mode not in ("merge", "static", "scan"):
            raise ValueError("SST_SKEW must be one of merge/static/scan, got %r"
                             % skew_mode)
        if skew_mode != "static" and packed is None:
            # merge/scan skews consume the packed array wholesale
            packed = jnp.pad(jnp.stack(arrs, axis=1),
                             ((0, 0), (0, 0), (0, nBp - nB), (0, 0)))
        if skew_mode == "merge":   # CPU default: plain memcpy pitch merge
            sk_all = jnp.stack([build_sk(g * GR, GR, D) for g in range(nG)])
        elif skew_mode == "static":
            # STATIC-offset skew: every row's diagonal placement r*step is a
            # python int, so XLA compiles each pad as a compile-time
            # lane-rotated copy.  The scan variant below places rows with a
            # TRACED offset, forcing the generic dynamic-update path
            # (~70 GB/s); static offsets run at copy bandwidth.
            def group_rows(g):
                frames = []
                for r in range(GR):
                    gi = g * GR + r
                    off = r * step
                    if packed is not None:
                        row = packed[:, :, gi]              # [batch, P, B]
                    elif gi < nB:
                        # fused pack: stack the row straight from the plan
                        # planes (reads fuse into this frame's pad)
                        row = jnp.stack([p[:, gi] for p in arrs], 1)
                    else:
                        frames.append(jnp.zeros((batch, P, D), jnp.float32))
                        continue
                    frames.append(jnp.pad(
                        row, ((0, 0), (0, 0), (off, D - off - B))))
                return jnp.stack(frames, 0)                 # [GR,batch,P,D]

            def xs_group(g):
                # per-group slab: rows -> transpose -> diagonal-chunk view.
                # Built INSIDE the python group loop below so only one
                # group's rows/sk double-live at a time (all-groups upfront
                # double-lives ~7.8 GB at bench shapes and made batch 48
                # superlinear: sweep 124.6 -> 211.5 ms for 1.5x the data)
                sk_g = jnp.transpose(group_rows(g), (3, 2, 1, 0))
                return sk_g.reshape(D // K, K, P, batch, GR)

            sk_all = None
        else:
            def skew_rows8(_, j):
                blk = jax.lax.dynamic_slice(packed, (0, 0, j * 8, 0),
                                            (batch, P, 8, B))
                off = (j % (GR // 8)) * 8 * step       # group-local offset
                frames = []
                for r in range(8):
                    frames.append(jax.lax.dynamic_update_slice(
                        jnp.zeros((batch, P, D), packed.dtype),
                        blk[:, :, r], (0, 0, off + r * step)))
                return _, jnp.stack(frames, 0)         # [8, batch, P, D]

            _, rows = jax.lax.scan(skew_rows8, jnp.float32(0),
                                   jnp.arange(nBp // 8, dtype=jnp.int32))
            rows = rows.reshape(nG, GR, batch, P, D)
            sk_all = jnp.transpose(rows, (0, 4, 3, 2, 1))
        if sk_all is None:
            xs_all = None
        else:
            xs_all = sk_all.reshape(nG, D // K, K, P, batch, GR)
            xs_group = lambda g: xs_all[g]              # noqa: E731
        if stop == "skew":
            if xs_all is None:
                return _stop_sum(jnp.stack([xs_group(g) for g in range(nG)]),
                                 4)
            return _stop_sum(xs_all, 4)

        # A fused Pallas sweep kernel (recursion ring + unskew butterfly in
        # VMEM) was built and measured here in round 4: sweep-only 399.7 ms
        # vs 125.8 ms for this XLA scan at bench shapes (batch 32, nB 418,
        # B 4096), plus a 405 s Mosaic compile.  The sequential
        # (batch-tile, chunk) grid serializes what the scan overlaps, so it
        # was removed — see docs/DESIGN.md "Pallas verdicts" and git history
        # (ops/pallas/sweep.py @ 69726a8) for the kernel and numbers.

        def group_body(prev_last, xs_g):
            # lane 0 (first row of the group) reads the previous group's
            # last row at bins t+1 and t+longv (zeros for group 0 — exactly
            # the zero head the monolithic shift_k used for row 0; out of
            # range -> 0, those vote coefficients are zero)
            pl = jnp.transpose(prev_last, (2, 1, 0))    # [B, nch, batch]
            z = jnp.zeros((D + longv, nch, batch), pl.dtype)
            plp = jax.lax.dynamic_update_slice(z, pl, (0, 0, 0))
            inj = jnp.stack([plp[1:D + 1], plp[longv:D + longv]],
                            axis=1)                     # [D, 2, nch, batch]
            if pair:   # nch index = ri*ch + c -> [D, 2, ch, 2, batch]
                inj = jnp.transpose(inj.reshape(D, 2, 2, ch, batch),
                                    (0, 1, 3, 2, 4))
                inj = inj.reshape(D // K, K, 2, ch, 2, batch)
            else:
                inj = inj.reshape(D // K, K, 2, ch, batch)
            outs = run_group(xs_g, GR, inj, D)
            if emit_mode == "scan":
                outs = jnp.transpose(outs.reshape(D, nch, batch, GR),
                                     (2, 1, 3, 0))     # [batch,nch,GR,D]
            if stop == "scan":     # profiling: raw diagonals, minimal carry
                og = unskew_group(outs[:, :, GR - 1:GR], 1, D)
                last = og[:, :, 0]
                if bands < B:
                    last = jnp.pad(last, ((0, 0), (0, 0), (0, B - bands)))
                return last[..., :B], outs
            og = unskew_group(outs, GR, D)             # [batch,nch,GR,bands]
            last = og[:, :, GR - 1]
            if bands < B:
                last = jnp.pad(last, ((0, 0), (0, 0), (0, B - bands)))
            return last[..., :B], og

        carry0 = jnp.zeros((batch, nch, B),
                           jnp.float32 if pair else a1_leaf.dtype)
        out_dt = jnp.float32 if pair else a1_leaf.dtype
        if stop == "scan":             # [nG, batch, nch, GR, D] raw diagonals
            if nG == 1:
                _, og = group_body(carry0, xs_group(0))
                ogs = og[None]
            elif xs_all is None:
                carry, og_list = carry0, []
                for g in range(nG):
                    carry, og = group_body(carry, xs_group(g))
                    og_list.append(og)
                ogs = jnp.stack(og_list)
            else:
                _, ogs = jax.lax.scan(group_body, carry0, xs_all)
            return _stop_sum(ogs, 1)
        # Each group's unskewed slab DUS-writes straight into the final
        # [batch, nch, nBp, bands] buffer (in-place through the loop): no
        # og stack, no major transpose, and — with the ri-major plane
        # order — the (re, im) halves below are contiguous views.
        if nG == 1:
            # monolithic: skip the group scan (a nested scan costs real
            # LLVM/XLA compile time for zero runtime benefit at nG=1)
            _, out = group_body(carry0, xs_group(0))
        elif xs_all is None:
            # static skew: python loop so each group's slab (rows + sk) is
            # built just before its scan and freed after — a lax.scan over
            # a pre-built xs_all materializes every group's xs upfront
            last = carry0
            out = jnp.zeros((batch, nch, nBp, bands), out_dt)
            for g in range(nG):
                last, og = group_body(last, xs_group(g))
                out = jax.lax.dynamic_update_slice(out, og, (0, 0, g * GR, 0))
        else:
            def g_step(carry, xy):
                last, acc = carry
                xs_g, goff = xy
                last, og = group_body(last, xs_g)
                acc = jax.lax.dynamic_update_slice(acc, og, (0, 0, goff, 0))
                return (last, acc), None

            offs_g = jnp.arange(nG, dtype=jnp.int32) * GR
            (_, out), _ = jax.lax.scan(
                g_step,
                (carry0, jnp.zeros((batch, nch, nBp, bands), out_dt)),
                (xs_all, offs_g))
        out = out[:, :, :nB]                    # [batch, nch, nB, bands]
        if pair_out:
            if pair:
                return out[:, :ch], out[:, ch:]
            return out.real, out.imag
        if pair:
            out = jax.lax.complex(out[:, :ch], out[:, ch:])
        return out                              # [batch, ch, nB, bands]

    @custom_batching.custom_vmap
    def fn(inp):
        out = batched_impl(jax.tree_util.tree_map(lambda x: x[None], inp))
        return jax.tree_util.tree_map(lambda v: v[0], out)

    @fn.def_vmap
    def _rule(axis_size, in_batched, inp):
        ib = in_batched[0]     # one positional arg -> one pytree of flags
        inp = jax.tree_util.tree_map(
            lambda x, b: x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape),
            inp, ib)
        out = batched_impl(inp)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return fn
