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


# Split modules (round 5): interpolation/peaks machinery and the batched
# planner moved out; re-export every name tests/tools/engine reference so
# `wavefront.<name>` keeps working.
from .ops.interp import (                                      # noqa: F401
    _WindowInterp, _interp_gather, _interp_mode, _interp_shift,
    _interp_shift_static, _peakmap_mode, _peaks_and_map_batched,
    _peaks_and_map_merge, _peaks_and_map_windowed, _rank_geometry,
    _rank_taps_window, _segment_sum_runs, _segmented_run_sums, _segsum_mode,
    _window_geometry, interp_planes_window, interp_planes_window_multi)
from .planner import (                                         # noqa: F401
    SweepInputs, _plan_tail_pair, _pmap, _pmul, _pmulc, _psel, _sel,
    _shift_up, plan_spectral)

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

