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


def _interp_shift(rows: jnp.ndarray, shift: jnp.ndarray, margin: int) -> jnp.ndarray:
    """rows [nB, B] interpolated at positions float32(b) - shift[k] via one
    dynamic slice + lerp per block (no gathers).  |shift| must be < margin.

    Bit-matches the gather path: the position is the *rounded* float32
    difference (the reference computes `inputBin - binTimeFactor` in float,
    :750), so floor(p) can be either b-floor(shift)-1 or b-floor(shift)
    depending on per-bin rounding — hence the three-row window and select."""
    nB, B = rows.shape
    pad = jnp.zeros((nB, margin), rows.dtype)
    padded = jnp.concatenate([pad, rows, pad], axis=1)
    m = jnp.floor(shift).astype(jnp.int32)            # per-block

    def slice_row(row, s):
        return jax.lax.dynamic_slice_in_dim(row, s, B + 2)

    win = jax.vmap(slice_row)(padded, margin - 1 - m)  # [nB, B+2]
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


# ---------------------------------------------------------------------------
# Batched precompute (stages a-f of SURVEY.md §3.3 for all blocks at once)
# ---------------------------------------------------------------------------
def plan_spectral(spectra: jnp.ndarray, prev_spectra: jnp.ndarray,
                  arrays: dict, controls: spectral.Controls,
                  flags: spectral.SpectralFlags,
                  consts: spectral.SpectralConsts, seed,
                  debug: bool = False) -> SweepInputs:
    """spectra/prev_spectra [nB, ch, B] complex; arrays = schedule flags.

    With debug=True returns (SweepInputs, dict of per-block intermediates) so
    tests can compare the integrated planner's chains (energy, smoothing,
    output map, prediction energies) against the reference engine's internals
    as dumped by oracle/probe.cpp.
    """
    dbg = {}
    nB, ch, B = spectra.shape
    longv = consts.long_vertical_step
    new = arrays["new_spectrum"]          # numpy bool [nB]
    reanalyse = arrays["reanalyse"]
    tf_np = arrays["time_factor"]         # numpy f32 [nB]
    rotor = jnp.asarray(consts.rotor)     # [B] complex64

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
        input_eff = spectra[np.maximum(src_input, 0)]
        input_eff = jnp.where(jnp.asarray((src_input >= 0))[:, None, None],
                              input_eff, 0)

    if reanalyse.all():
        prev_base = prev_spectra
    else:
        base_idx = np.where(new & ~reanalyse, np.maximum(m_prev, 0),
                            np.maximum(src_input, 0))
        base_valid = np.where(new & ~reanalyse, m_prev >= 0, src_input >= 0)
        prev_base = jnp.where(jnp.asarray(reanalyse)[:, None, None],
                              prev_spectra, spectra[base_idx])
        prev_base = jnp.where(jnp.asarray(base_valid | reanalyse)[:, None, None],
                              prev_base, 0)
    if new.all():
        prev_eff = prev_base * rotor
    else:
        prev_eff = jnp.where(jnp.asarray(new)[:, None, None],
                             prev_base * rotor, prev_base)

    in_energy = input_eff.real ** 2 + input_eff.imag ** 2   # [nB, ch, B]
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

        if automated:
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

        env_pad = jnp.concatenate([env, jnp.zeros((nB, 2), env.dtype)], -1)
        input_f = jnp.asarray(consts.band_freq)
        output_f = (spectral.map_freq(input_f, ctrl_bb, flags)
                    if flags.formant_compensation else input_f)
        output_f = spectral.inv_map_formant(output_f, ctrl_bb)
        target_band = spectral._freq_to_band(output_f, consts)  # [B] or [nB, B]
        tb = jnp.minimum(target_band, f32(B))
        floor_band = jnp.floor(tb).astype(jnp.int32)
        frac = tb - floor_band.astype(jnp.float32)
        if floor_band.ndim == 1:
            lo = jnp.take(env_pad, jnp.clip(floor_band, 0, B + 1), axis=-1)
            hi = jnp.take(env_pad, jnp.clip(floor_band + 1, 0, B + 1), axis=-1)
        else:
            lo = jnp.take_along_axis(env_pad, jnp.clip(floor_band, 0, B + 1), -1)
            hi = jnp.take_along_axis(env_pad,
                                     jnp.clip(floor_band + 1, 0, B + 1), -1)
        target_e = jnp.where(target_band < 0, f32(0), lo + (hi - lo) * frac)
        ratio = target_e / (env + f32(1e-30))               # [nB, B]
        in_energy = in_energy * ratio[:, None, :]

    # ---- preliminary-prediction constants (:697-719) ----------------------
    if flags.mapped:
        pe = [_interp_gather(in_energy[:, c], input_bin)
              * jnp.maximum(f32(0), freq_grad) for c in range(ch)]
        pi = [_interp_gather(input_eff[:, c], input_bin) for c in range(ch)]
        prev_i = [_interp_gather(prev_eff[:, c], input_bin)
                  for c in range(ch)]
    else:
        pe = [in_energy[:, c] for c in range(ch)]
        pi = [input_eff[:, c] for c in range(ch)]
        prev_i = [prev_eff[:, c] for c in range(ch)]

    pe_prev = [jnp.concatenate([jnp.zeros((1, B), x.dtype), x[:-1]], 0)
               for x in pe]
    if new.all():
        rotor_eff = rotor[None, :]
    else:
        rotor_eff = jnp.where(jnp.asarray(new)[:, None], rotor,
                              jnp.ones((), rotor.dtype))    # [nB, B]
    c1 = [rotor_eff * (pi[c] * jnp.conj(prev_i[c]))
          / (jnp.maximum(pe_prev[c], pe[c]) + f32(NOISE_FLOOR))
          for c in range(ch)]

    # ---- main-prediction coefficients (:722-803) --------------------------
    mc = jnp.argmax(jnp.stack(pe, 1), axis=1).astype(jnp.int32)  # [nB, B]
    pi_max = _sel(mc, pi)

    tf = np.maximum(tf_np, f32(1.0 / MAX_CLEAN_STRETCH))    # static [nB]
    any_random = bool((tf > f32(MAX_CLEAN_STRETCH)).any())
    tf_j = jnp.asarray(tf)

    if any_random:
        random_tf = jnp.asarray(tf > f32(MAX_CLEAN_STRETCH))
        lo_d = f32(MAX_CLEAN_STRETCH) * 2 * random_tf.astype(jnp.float32) - tf_j
        key = jax.random.PRNGKey(seed)
        draws = jax.random.uniform(key, (2, nB, B), jnp.float32,
                                   minval=lo_d[None, :, None],
                                   maxval=tf_j[None, :, None])
        btf1 = jnp.where(random_tf[:, None], draws[0], tf_j[:, None])
        btf2 = jnp.where(random_tf[:, None], draws[1], tf_j[:, None])
    else:
        btf1 = btf2 = None   # uniform per-block shift == tf

    margin = int(np.ceil(longv * float(tf.max()))) + 2

    def vote_gathers(z):
        """z complex [nB, B] -> (short_down, long_down, up_short, up_long)."""
        base = input_bin if flags.mapped else b_f[None, :]
        if any_random:
            sd = _interp_gather(z, base - btf1)
            ld = _interp_gather(z, base - f32(longv) * btf1)
            us = _interp_gather(z, _shift_up(base, 1) - btf2)
            ul = _interp_gather(z, _shift_up(base, longv)
                                - f32(longv) * btf2)
            return sd, ld, us, ul
        if flags.mapped:
            sd = _interp_gather(z, base - tf_j[:, None])
            ld = _interp_gather(z, base - f32(longv) * tf_j[:, None])
        else:
            sd = _interp_shift(z, tf_j, margin)
            ld = _interp_shift(z, f32(longv) * tf_j, margin)
        # same binTimeFactor in both vote branches => up positions are the
        # down positions shifted one (or longv) bins up (:764-786)
        us = _shift_up(sd, 1)
        ul = _shift_up(ld, longv)
        return sd, ld, us, ul

    sd = [None] * ch
    ld = [None] * ch
    us = [None] * ch
    ul = [None] * ch
    for c in range(ch):
        sd[c], ld[c], us[c], ul[c] = vote_gathers(input_eff[:, c])
    short_down = _sel(mc, sd)
    long_down = _sel(mc, ld)
    up_short = _sel(mc, us)
    up_long = _sel(mc, ul)

    d1 = pi_max * jnp.conj(short_down)
    d2 = pi_max * jnp.conj(long_down)
    b_idx = jnp.arange(B)
    d1 = jnp.where(b_idx > 0, d1, 0)
    d2 = jnp.where(b_idx >= longv, d2, 0)

    pi_up1 = _sel(mc, [_shift_up(pi[c], 1) for c in range(ch)])
    pi_upl = _sel(mc, [_shift_up(pi[c], longv) for c in range(ch)])
    c1_up1 = _sel(mc, [_shift_up(c1[c], 1) for c in range(ch)])
    c1_upl = _sel(mc, [_shift_up(c1[c], longv) for c in range(ch)])
    a1 = c1_up1 * jnp.conj(pi_up1 * jnp.conj(up_short))
    a2 = c1_upl * jnp.conj(pi_upl * jnp.conj(up_long))
    a1 = jnp.where(b_idx < B - 1, a1, 0)
    a2 = jnp.where(b_idx < B - longv, a2, 0)

    result = SweepInputs(a1=a1, a2=a2, d1=d1, d2=d2, mc=mc,
                         pe=tuple(pe), pi=tuple(pi))
    if debug:
        dbg["pe"] = jnp.stack(pe, axis=1)              # [nB, ch, B]
        return result, dbg
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


def spectral_all_blocks(spectra, prev_spectra, arrays, controls, flags,
                        consts, seed):
    """Full planned pipeline: [nB, ch, B] spectra -> [nB, ch, B] outputs."""
    inputs = plan_spectral(spectra, prev_spectra, arrays, controls, flags,
                           consts, seed)
    longv = consts.long_vertical_step
    step = longv + 1
    nB = inputs.a1.shape[0]
    ch = len(inputs.pe)

    outs = _run_sweep(inputs, longv)               # [D, ch, nB]
    skewed = jnp.transpose(outs, (2, 0, 1))        # [nB, D, ch]
    out = unskew(skewed, step, consts.bands)       # [nB, B, ch]
    return jnp.moveaxis(out, 2, 1)                 # [nB, ch, B]


def _run_sweep(inputs: SweepInputs, longv: int, unroll: int = 32):
    """Scan over diagonals, `unroll` diagonals per step (fatter DMA, fewer
    sequential steps; the in-step chain runs on register values).

    The xs layout is built with exactly ONE materialization (the dominant cost
    of the whole render is this inflated diagonal-major copy — measured 48% of
    the pipeline before the fusions below):
      - all planes pack into one [P, nB, B] array (15 separate skews measured
        ~7x slower); XLA fuses the stack into the plane producers,
      - the pad-flatten-reshape skew pads the row pitch so the diagonal count
        comes out at a multiple of K directly — padding to D afterwards was a
        second full copy (+95 ms at bench shapes),
      - the [D, P, nB] transpose materializes once as the scan operand
        (unavoidable: scan xs must be diagonal-major); K=32 slabs make that
        relayout DMA-efficient (K=16 measured ~10% slower end to end),
      - for <=2 channels the max-channel plane is recomputed in-register from
        the prediction energies instead of being carried (argmax over 2)."""
    nB = inputs.a1.shape[0]
    ch = len(inputs.pe)
    step = longv + 1
    D0 = inputs.a1.shape[1] + (nB - 1) * step
    K = unroll
    D = -(-D0 // K) * K

    carry_mc = ch > 2
    arrs = []
    for name in ("a1", "a2", "d1", "d2"):
        z = getattr(inputs, name)
        arrs += [z.real, z.imag]
    if carry_mc:
        arrs.append(inputs.mc.astype(jnp.float32))
    for c in range(ch):
        arrs.append(inputs.pe[c])
    for c in range(ch):
        arrs += [inputs.pi[c].real, inputs.pi[c].imag]
    packed = jnp.stack(arrs, axis=0)               # [P, nB, B]
    P = packed.shape[0]
    B = packed.shape[2]
    # skew with row pitch T = D + step: the flatten/prefix/reshape view then
    # yields [nB, D] rows (columns beyond B + k*step read the zero pad), so no
    # separate pad-to-D pass is needed
    T = D + step
    xp = jnp.pad(packed, [(0, 0), (0, 0), (0, T - B)])
    flat = xp.reshape(P, nB * T)
    sk = flat[:, :nB * (T - step)].reshape(P, nB, D)
    sk = jnp.transpose(sk, (2, 0, 1))              # [D, P, nB] (bins in lanes)
    sk = sk.reshape(D // K, K, P, nB)

    def unpack(row):
        """row [K, P, nB] -> SweepInputs-like views with [K, nB] planes."""
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
        pe = tuple(take() for _ in range(ch))
        pi = tuple(C(take(), take()) for _ in range(ch))
        if not carry_mc:
            # argmax over <=2 channels, first-wins on ties (:722)
            mc = (jnp.zeros(pe[0].shape, jnp.int32) if ch == 1
                  else (pe[1] > pe[0]).astype(jnp.int32))
        return SweepInputs(a1=a1, a2=a2, d1=d1, d2=d2, mc=mc, pe=pe, pi=pi)

    xs = sk

    def shift_k(x):
        return jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]], axis=-1)

    def cell(ring_list, x, j):
        """ring_list: newest-last python list of [ch][nB] rows."""
        mc = x.mc[j]
        prev1 = [ring_list[-1][c] for c in range(ch)]
        prevl = [ring_list[0][c] for c in range(ch)]
        down1 = _sel(mc, prev1)
        downl = _sel(mc, prevl)
        up1 = _sel(mc, [shift_k(p) for p in prevl])
        upl = _sel(mc, [shift_k(p) for p in prev1])
        phase = (x.d1[j] * down1 + x.d2[j] * downl) + x.a1[j] * up1 + x.a2[j] * upl
        pe_max = _sel(mc, [x.pe[c][j] for c in range(ch)])
        pi_max = _sel(mc, [x.pi[c][j] for c in range(ch)])
        out_main = _make_output(pe_max, pi_max, phase)
        outs = []
        for c in range(ch):
            ct = x.pi[c][j] * jnp.conj(pi_max)
            locked = _make_output(x.pe[c][j], x.pi[c][j], out_main * ct)
            outs.append(jnp.where(mc == c, out_main, locked))
        return outs

    def body(ring, row):
        x = unpack(row)
        # ring: [longv, ch, nB]; list view newest-last
        ring_list = [[ring[l, c] for c in range(ch)] for l in range(longv)]
        emitted = []
        for j in range(K):
            outs = cell(ring_list, x, j)
            ring_list = ring_list[1:] + [outs]
            emitted.append(jnp.stack(outs, axis=0))
        ring2 = jnp.stack([jnp.stack(r, 0) for r in ring_list], 0)
        return ring2, jnp.stack(emitted, axis=0)   # [K, ch, nB]

    ring0 = jnp.zeros((longv, ch, nB), inputs.a1.dtype)
    _, outs = jax.lax.scan(body, ring0, xs)        # [D/K, K, ch, nB]
    return outs.reshape(D, ch, nB)[:D0]            # [D0, ch, nB]
