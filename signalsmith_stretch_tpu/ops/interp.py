"""Fractional-bin interpolation + peaks/output-map machinery.

Split out of wavefront.py (round 5): everything here is analysis-side
derivation shared by the batched planner — the windowed/gather interp
variants, segmented run sums, the rank+taps window, and the sort-merge /
windowed peaks+output-map builders.  The diagonal sweep engine stays in
wavefront.py; the batched planner lives in planner.py.

Reference coverage: smoothing/peaks/output map signalsmith-stretch.h:816-917,
fractional access :859-917 — see the per-function docstrings.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import spectral

f32 = np.float32

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
        from .pallas import interp as pallas_interp
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
    total (garbage outside runs — callers mask).  Two log-depth scans: a
    segmented prefix sum (reset at starts), then a reverse copy-with-reset
    that propagates each run's last prefix value backward.  On TPU both run
    in Hillis-Steele shift form (one value plane + one flag plane, no
    odd/even interleave relayouts — see scan_ops._use_shift_scan); CPU
    keeps lax.associative_scan (the form the probe gates were measured
    against — same sums reassociated)."""
    from .scan_ops import _use_shift_scan
    B = data.shape[-1]
    # run end at bin b <=> next bin starts a new run (or b is last)
    end = jnp.concatenate(
        [start[..., 1:], jnp.ones(start.shape[:-1] + (1,), bool)], -1)
    if _use_shift_scan():
        def shr(x, k, fill):
            head = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
            return jnp.concatenate([head, x[..., :-k]], -1)

        v, f = data, start
        k = 1
        while k < B:
            v = v + jnp.where(f, 0, shr(v, k, jnp.float32(0)))
            f = f | shr(f, k, True)
            k *= 2
        tv, tf = v[..., ::-1], end[..., ::-1]
        k = 1
        while k < B:
            tv = jnp.where(tf, tv, shr(tv, k, jnp.float32(0)))
            tf = tf | shr(tf, k, True)
            k *= 2
        return tv[..., ::-1]

    def seg_sum(l, r):
        return (jnp.where(r[1], r[0], l[0] + r[0]), l[1] | r[1])

    prefix, _ = jax.lax.associative_scan(seg_sum, (data, start), axis=-1)
    rev = prefix[..., ::-1]
    rend = end[..., ::-1]

    def seg_copy(l, r):
        return (jnp.where(r[1], r[0], l[0]), l[1] | r[1])

    tot_rev, _ = jax.lax.associative_scan(seg_copy, (rev, rend), axis=-1)
    return tot_rev[..., ::-1]


def _segmented_run_sums_rev(data, start):
    """Run totals AT RUN-START bins via one reverse segmented prefix.

    data [..., B] (masked to zero outside runs), start [..., B].  In
    reversed bin order the segment boundaries are the run ENDS (the bin
    before each next start, i.e. the reversed `start` shifted into
    leading position), so a single segmented prefix sum accumulates each
    run back-to-front and the original START bin — the last element of
    its reversed segment — holds the full run total.  Values off the
    start bins are partial sums (callers mask).  Same float sums as the
    two-pass _segmented_run_sums up to scan-tree reassociation."""
    end = jnp.concatenate(
        [start[..., 1:], jnp.ones(start.shape[:-1] + (1,), bool)], -1)

    def seg_sum(l, r):
        return (jnp.where(r[1], r[0], l[0] + r[0]), l[1] | r[1])

    prefix_rev, _ = jax.lax.associative_scan(
        seg_sum, (data[..., ::-1], end[..., ::-1]), axis=-1)
    return prefix_rev[..., ::-1]


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
    (start, b_idx, avg_band, peak_out_raw, first_in, first_out,
     last_in, last_out, has) = _peaks_head(energy, smoothed, controls,
                                           flags, consts)

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
    return _peaks_assemble(b_idx, start, prev_in_, prev_o, next_in_, next_o,
                           lo_v, hi_v, first_in, first_out, last_in,
                           last_out, has)


def _peaks_head(energy, smoothed, controls, flags, consts):
    """Shared run/centroid/row-scalar head of the peaks builders."""
    f1 = jnp.float32
    nB, B = energy.shape
    above = energy > smoothed
    start = above & jnp.concatenate(
        [jnp.ones((nB, 1), bool), ~above[:, :-1]], axis=1)
    b_idx = jnp.arange(B, dtype=jnp.float32)

    em = jnp.where(above, energy, 0)
    # The merge/invmap builders only read run sums AT RUN STARTS (row
    # scalars, sort payloads and fill chains are all where(start, ...)),
    # so the usual forward-prefix + backward-propagate pair is half
    # wasted: ONE reverse segmented prefix (reset at run ENDS) lands the
    # full run total exactly on the start bin; everything else is partial
    # sums the callers mask off anyway.
    band_sum = _segmented_run_sums_rev(b_idx[None] * em, start)
    energy_sum = _segmented_run_sums_rev(em, start)
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
    return (start, b_idx, avg_band, peak_out_raw, first_in, first_out,
            last_in, last_out, has)


def _peaks_assemble(b_idx, start, prev_in_, prev_o, next_in_, next_o,
                    lo_v, hi_v, first_in, first_out, last_in, last_out,
                    has):
    """Shared smoothstep-interpolation tail of the peaks builders
    (reference :894-917)."""
    f1 = jnp.float32
    B = start.shape[1]
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


def _peaks_and_map_invmap(energy, smoothed, controls, flags, consts):
    """Inverse-map formulation of the peaks/output-map builder: NO sorts.

    The standard frequency map (tonality-limited semitone shift,
    reference :300-309) is piecewise-linear and strictly increasing, so
    peak output positions po(centroid) are increasing across runs and the
    prev-peak-for-bin-b query ("last peak with cell <= b", :888-891) is a
    PREFIX boundary.  Anchor each output bin b at the closed-form inverse
    X = po^-1(b): the true prev peak provably lies among the last THREE
    runs starting at or before floor(X)+1 —

      * run starts are >= 2 bins apart (a start needs above[i] and
        ~above[i-1]), so at most one run starts <= X with centroid > X
        (it would straddle X, and the next run starts past its end) and
        at most one more starts in (X, floor(X)+1];
      * runs starting later have centroid > X + 1, hence po > b by at
        least one output bin times the map slope — orders of magnitude
        above the f32 error of the X anchor, which therefore only needs
        to be approximately right.

    The THREE candidate centroids (and each one's successor-run centroid,
    whose po > b makes it the "next" table entry) are fill-forward planes
    in source-bin space (cummax chains), looked up at the SHARED [B]
    anchor vector with one exact one-hot matmul on the MXU (the same
    shared-position trick as the formant envelope).  Selection compares
    po(candidate) <= b with the reference's own float chain (cell <= b
    <=> po <= b exactly, since cells = ceil(po) and b is an integer), so
    the chosen peak — and therefore every output value — is bit-identical
    to the sort-merge builder, without its two lax.sort calls (~145 ms of
    the mapped plan at bench shapes).  Requires an invertible map
    (no custom_map) and scalar controls; callers fall back to merge
    otherwise."""
    f1 = jnp.float32
    nB, B = energy.shape
    (start, b_idx, avg_band, peak_out_raw, first_in, first_out,
     last_in, last_out, has) = _peaks_head(energy, smoothed, controls,
                                           flags, consts)
    ninf = f1(-np.inf)
    pinf = f1(np.inf)

    def shr1(x, fill):
        return jnp.concatenate(
            [jnp.full((nB, 1), fill, x.dtype), x[:, :-1]], 1)

    def shl1(x, fill):
        return jnp.concatenate(
            [x[:, 1:], jnp.full((nB, 1), fill, x.dtype)], 1)

    # fill-forward candidate chains: c1 = centroid of the last run
    # starting <= i, c2/c3 its predecessors; nx1 = centroid of the run
    # AFTER c1 (+inf once c1 is the final run).  All increasing across
    # starts, so the fills are plain cummax (nx1's +inf tail included).
    c1f = jax.lax.cummax(jnp.where(start, avg_band, ninf), axis=1)
    c2f = jax.lax.cummax(jnp.where(start, shr1(c1f, ninf), ninf), axis=1)
    c3f = jax.lax.cummax(jnp.where(start, shr1(c2f, ninf), ninf), axis=1)
    n1b = jax.lax.cummin(
        jnp.where(start, avg_band, pinf)[:, ::-1], axis=1)[:, ::-1]
    nx1f = jax.lax.cummax(jnp.where(start, shl1(n1b, pinf), ninf), axis=1)

    # closed-form inverse of the band-space map for the anchors
    N = f1(consts.fft_samples)
    mult = controls.freq_multiplier
    limit = controls.freq_tonality_limit
    mf = (b_idx + f1(0.5)) / N
    fx = jnp.where(mf > limit * mult, mf - (mult - f1(1)) * limit,
                   mf / mult)
    X = fx * N - f1(0.5)
    jp = jnp.clip(jnp.floor(X).astype(jnp.int32) + 1, 0, B - 1)   # [B]

    # one exact one-hot lookup of the 4 planes at the shared anchors
    big = f1(1e30)
    planes4 = jnp.stack([jnp.clip(c1f, -big, big),
                         jnp.clip(c2f, -big, big),
                         jnp.clip(c3f, -big, big),
                         jnp.clip(nx1f, -big, big)], 1)           # [nB,4,B]
    wsel = (jnp.arange(B, dtype=jnp.int32)[:, None]
            == jp[None, :]).astype(jnp.float32)                   # [B, B]
    V = jnp.einsum("nkw,wb->nkb", planes4, wsel,
                   precision=jax.lax.Precision.HIGHEST)
    c1v, c2v, c3v, nxv = V[:, 0], V[:, 1], V[:, 2], V[:, 3]

    def po(x):
        return spectral._freq_to_band(
            spectral.map_freq(spectral._band_to_freq(x, consts),
                              controls, flags), consts)

    thresh = f1(1e29)
    bq = b_idx[None]
    po1, po2, po3 = po(c1v), po(c2v), po(c3v)
    g1 = (po1 <= bq) & (c1v > -thresh)
    g2 = (po2 <= bq) & (c2v > -thresh)
    g3 = (po3 <= bq) & (c3v > -thresh)
    prev_in_ = jnp.where(g1, c1v, jnp.where(g2, c2v, c3v))
    prev_o = jnp.where(g1, po1, jnp.where(g2, po2, po3))
    lo_v = g1 | g2 | g3
    next_in_ = jnp.where(g1, nxv, jnp.where(g2, c1v, c2v))
    next_o = jnp.where(g1, po(nxv), jnp.where(g2, po1, po2))
    hi_v = lo_v & (next_in_ < thresh)

    return _peaks_assemble(b_idx, start, prev_in_, prev_o, next_in_, next_o,
                           lo_v, hi_v, first_in, first_out, last_in,
                           last_out, has)


def _peakmap_mode() -> str:
    """Peaks/output-map builder strategy: 'invmap' (inverse-anchored MXU
    lookups, no sorts — TPU default for the standard map), 'merge'
    (sort-merge, exact for ANY monotone map — TPU fallback), or 'window'
    (per-chunk windowed taps — CPU default, value-matched to the
    per-block engine's accumulation order).  Override with SST_PEAKMAP."""
    mode = os.environ.get("SST_PEAKMAP", "auto")
    if mode == "auto":
        return "invmap" if jax.default_backend() != "cpu" else "window"
    if mode not in ("invmap", "merge", "window"):
        raise ValueError("SST_PEAKMAP must be invmap, merge or window, "
                         "got %r" % mode)
    return mode


def _peaks_and_map_batched(energy, smoothed, controls, flags, consts, geom):
    mode = _peakmap_mode()
    if mode == "invmap":
        # the inverse anchor needs an invertible map and one shared [B]
        # anchor vector (scalar controls); otherwise sort-merge
        if (flags.custom_map is None
                and jnp.ndim(controls.freq_multiplier) == 0):
            return _peaks_and_map_invmap(energy, smoothed, controls, flags,
                                         consts)
        mode = "merge"
    if mode == "merge":
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


