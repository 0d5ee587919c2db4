"""Per-block spectral processor: the TPU-native `processSpectrum`.

Pure function `(carry, block_inputs) -> (carry', output_spectrum)` over
[channels, bands] tensors, implementing the reference pipeline
(signalsmith-stretch.h:633-813, call-stack SURVEY.md §3.3):

  a. phase advance of output/prevInput by e^{i 2π f_b H}   (:642-660)
  b. cross-channel energy + slew smoothing                  (:816-848)
  c. peak finding (runs of energy > smoothed)               (:859-880)
  d. output map (smoothstep between mapped peaks)           (:882-917)
  e. formant envelope + energy rescale                      (:970-1036)
  f. preliminary phase-vocoder prediction                   (:697-719)
  g. main prediction with vertical phase votes              (:722-803)
  h. prevInput <- input                                     (:806-812)

Stage (g) is the only sequentially-dependent part (bin b reads the *new*
outputs of bins b-1 and b-longVerticalStep): here it is a `lax.scan` over bins
carrying a sliding window of freshly-written outputs, with every gather/twist
precomputed as vectorized tensor ops.  Everything else is embarrassingly
parallel over bins, with the bin-sweep recurrences as log-depth associative
scans (ops/scan_ops.py).

All arithmetic is float32/complex64 to track the reference's `Sample=float`
numerics; schedule-derived scalars arrive as float32 computed with C++
semantics (schedule.py).
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import StretchConfig, MAX_CLEAN_STRETCH, NOISE_FLOOR
from .ops import scan_ops

f32 = np.float32


# ---------------------------------------------------------------------------
# Static per-config constants
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SpectralConsts:
    bands: int
    channels: int
    fft_samples: int
    interval: int
    long_vertical_step: int       # round(fftSamples/interval) (:637)
    smoothing_bins: float         # float32 fftSamples/interval (:636)
    slew: float                   # 1/(1 + smoothingBins*0.5) (:819)
    rotor: np.ndarray             # [bands] complex64 — incremental rotor values
    band_freq: np.ndarray         # [bands] float32 — binToFreq(b)

    @classmethod
    def for_config(cls, cfg: StretchConfig) -> "SpectralConsts":
        B, N, H = cfg.bands, cfg.fft_samples, cfg.interval_samples
        band_freq = ((np.arange(B, dtype=f32) + f32(0.5)) / f32(N)).astype(f32)
        # Incremental rotor exactly as the reference builds it (:647-655):
        # float32 complex multiplies accumulate the same drift.
        angle0 = f32(f32(band_freq[0]) * f32(H) * f32(2 * math.pi))
        freq_step = f32(band_freq[1] - band_freq[0])
        angle_step = f32(f32(freq_step) * f32(H) * f32(2 * math.pi))
        rot = np.complex64(complex(f32(np.cos(np.float64(angle0))),
                                   f32(np.sin(np.float64(angle0)))))
        rot_step = np.complex64(complex(f32(np.cos(np.float64(angle_step))),
                                        f32(np.sin(np.float64(angle_step)))))
        rotor = np.empty(B, np.complex64)
        for b in range(B):
            rotor[b] = rot
            re = f32(f32(rot.real * rot_step.real) - f32(rot.imag * rot_step.imag))
            im = f32(f32(rot.real * rot_step.imag) + f32(rot.imag * rot_step.real))
            rot = np.complex64(complex(re, im))
        smoothing_bins = float(f32(N) / f32(H))
        slew = float(f32(1) / f32(f32(1) + f32(smoothing_bins) * f32(0.5)))
        return cls(bands=B, channels=cfg.channels, fft_samples=N, interval=H,
                   long_vertical_step=cfg.long_vertical_step,
                   smoothing_bins=smoothing_bins, slew=slew,
                   rotor=rotor, band_freq=band_freq)


@dataclasses.dataclass(frozen=True)
class SpectralFlags:
    """Static branch structure (decided at trace time, like the C++ bools)."""
    mapped: bool                  # customFreqMap || freqMultiplier != 1 (:300)
    process_formants: bool        # (:310)
    formant_compensation: bool
    custom_map: Optional[Callable] = None
    # formantBaseFreq <= 0 => run the pitch estimator (:982-983); static so
    # the (sequential) estimator can be skipped entirely when a base is given
    formant_auto: bool = True
    # Static bound on the inverse frequency-map gradient (d inputBin /
    # d outputBin, and the formant target-band slope), used to size the
    # windowed-interp geometry (wavefront._window_geometry).  None =>
    # unbounded (custom maps): the window path is disabled and the exact
    # gather path is used.  Builders with concrete controls set max(1, 1/mult).
    inv_grad_bound: Optional[float] = None
    # Pluggable RNG — the analogue of the reference's `RandomEngine` template
    # parameter (signalsmith-stretch.h:34-39, 610-616): a callable
    # (key, shape, minval, maxval) -> float32 draws.  None = jax.random.uniform
    # with the default (threefry) implementation.  Consumed only for the
    # randomized binTimeFactors of >2x stretch (:639-640, 749).
    random_engine: Optional[Callable] = None

    def __hash__(self):
        return hash((self.mapped, self.process_formants,
                     self.formant_compensation, id(self.custom_map),
                     self.formant_auto, self.inv_grad_bound,
                     id(self.random_engine)))


def draw_uniform(flags: "SpectralFlags", key, shape, minval, maxval):
    """Randomized-binTimeFactor draws through the pluggable engine."""
    if flags.random_engine is not None:
        return flags.random_engine(key, shape, minval, maxval)
    return jax.random.uniform(key, shape, jnp.float32,
                              minval=minval, maxval=maxval)


def inv_grad_bound_for(freq_multiplier: float, formant_multiplier: float = 1.0,
                       formant_compensation: bool = False,
                       has_custom_map: bool = False,
                       process_formants: bool = False) -> Optional[float]:
    """Host-side bound on the window-interp position slopes (SpectralFlags
    .inv_grad_bound) from concrete control values.

    The output map's inputBin slope is bounded by the inverse frequency-map
    gradient (max(1, 1/mult) for the tonality-limit map, :850-856); the
    formant target-band slope by the inv-formant map (:920-925), composed with
    mapFreq under pitch compensation.  Custom maps return None (unbounded:
    the windowed interp cannot size its (C, L) capacity, so consumers fall
    back to the exact gather path).  Env override: SST_INTERP_GRAD — a value
    > 0 forces that bound; <= 0 forces None (disable the window path)."""
    env = os.environ.get("SST_INTERP_GRAD")
    if env is not None and env.strip():
        bound = float(env)
        return bound if bound > 0 else None
    if has_custom_map:
        return None
    g = max(1.0, 1.0 / float(freq_multiplier))
    if process_formants:
        gf = max(1.0, 1.0 / float(formant_multiplier))
        if formant_compensation:
            gf *= max(1.0, float(freq_multiplier))
        g = max(g, gf)
    return g


class Controls(NamedTuple):
    """Traced control scalars (float32)."""
    freq_multiplier: jnp.ndarray
    freq_tonality_limit: jnp.ndarray
    formant_multiplier: jnp.ndarray
    inv_formant_multiplier: jnp.ndarray
    formant_base_freq: jnp.ndarray

    @classmethod
    def make(cls, freq_multiplier=1.0, freq_tonality_limit=1.0,
             formant_multiplier=1.0, formant_base_freq=0.0):
        return cls(
            freq_multiplier=jnp.float32(freq_multiplier),
            freq_tonality_limit=jnp.float32(freq_tonality_limit),
            formant_multiplier=jnp.float32(formant_multiplier),
            inv_formant_multiplier=jnp.float32(1.0) / jnp.float32(formant_multiplier),
            formant_base_freq=jnp.float32(formant_base_freq),
        )


class SpectralCarry(NamedTuple):
    input: jnp.ndarray        # [ch, B] complex64 (Band.input)
    prev_input: jnp.ndarray   # [ch, B] complex64 (Band.prevInput)
    output: jnp.ndarray       # [ch, B] complex64 (Band.output)
    pred_energy: jnp.ndarray  # [ch, B] float32 (Prediction.energy)
    freq_est_weighted: jnp.ndarray  # scalar f32 (:927)
    freq_est_weight: jnp.ndarray    # scalar f32 (:928)
    rng: jax.Array            # PRNG key (randomized phases for >2x stretch)

    @classmethod
    def initial(cls, consts: SpectralConsts, seed: int = 0) -> "SpectralCarry":
        z = jnp.zeros((consts.channels, consts.bands), jnp.complex64)
        zf = jnp.zeros((consts.channels, consts.bands), jnp.float32)
        return cls(input=z, prev_input=z, output=z, pred_energy=zf,
                   freq_est_weighted=jnp.float32(0),
                   freq_est_weight=jnp.float32(0),
                   rng=jax.random.PRNGKey(seed))


class BlockInputs(NamedTuple):
    spectrum: jnp.ndarray        # [ch, B] complex64 analysis (valid if new_spectrum)
    prev_spectrum: jnp.ndarray   # [ch, B] complex64 re-analysis (valid if reanalyse)
    new_spectrum: jnp.ndarray    # bool scalar
    reanalyse: jnp.ndarray       # bool scalar
    time_factor: jnp.ndarray     # f32 scalar


# ---------------------------------------------------------------------------
# Frequency maps (signalsmith-stretch.h:850-856, 920-925)
# ---------------------------------------------------------------------------
def map_freq(freq, controls: Controls, flags: SpectralFlags):
    if flags.custom_map is not None:
        return flags.custom_map(freq)
    limit = controls.freq_tonality_limit
    mult = controls.freq_multiplier
    return jnp.where(freq > limit, freq + (mult - 1) * limit, freq * mult)


def inv_map_formant(freq, controls: Controls):
    limit = controls.freq_tonality_limit
    return jnp.where(freq * controls.inv_formant_multiplier > limit,
                     freq + (1 - controls.formant_multiplier) * limit,
                     freq * controls.inv_formant_multiplier)


def _freq_to_band(freq, consts: SpectralConsts):
    return freq * f32(consts.fft_samples) - f32(0.5)


def _band_to_freq(band, consts: SpectralConsts):
    return (band + f32(0.5)) / f32(consts.fft_samples)


# ---------------------------------------------------------------------------
# Fractional-bin gathers (signalsmith-stretch.h:547-580: zero outside [0,B))
# ---------------------------------------------------------------------------
def _gather_band(arr, idx):
    """arr [..., B], idx int [...] -> values with zero outside [0, B)."""
    B = arr.shape[-1]
    valid = (idx >= 0) & (idx < B)
    v = jnp.take_along_axis(arr, jnp.clip(idx, 0, B - 1), axis=-1)
    return jnp.where(valid, v, jnp.zeros((), arr.dtype))


def _frac_gather(arr, low_idx, frac):
    lo = _gather_band(arr, low_idx)
    hi = _gather_band(arr, low_idx + 1)
    return lo + (hi - lo) * frac


# ---------------------------------------------------------------------------
# Energy smoothing (signalsmith-stretch.h:816-848)
# ---------------------------------------------------------------------------
def _smooth_energy(energy, consts: SpectralConsts):
    slew = f32(consts.slew)
    sm = energy
    e = jnp.float32(0)
    for _ in range(2):  # steps 1 and 2: each is a down then an up pass
        sm, e = scan_ops.iir_backward(sm, e, slew)
        sm, e = scan_ops.iir_forward(sm, e, slew)
    return sm


# ---------------------------------------------------------------------------
# Peaks + output map (signalsmith-stretch.h:859-917)
# ---------------------------------------------------------------------------
def _peaks_and_map(energy, smoothed, controls, flags, consts):
    B = consts.bands
    nseg = B // 2 + 2
    above = energy > smoothed
    start = above & jnp.concatenate([jnp.array([True]), ~above[:-1]])
    run_id = jnp.cumsum(start.astype(jnp.int32)) - 1
    seg = jnp.where(above, run_id, nseg - 1)
    b_idx = jnp.arange(B, dtype=jnp.float32)
    band_sum = jax.ops.segment_sum(b_idx * energy, seg, num_segments=nseg)
    energy_sum = jax.ops.segment_sum(energy, seg, num_segments=nseg)
    n_peaks = jnp.sum((start & above).astype(jnp.int32))

    valid = jnp.arange(nseg) < n_peaks
    avg_band = band_sum / jnp.where(energy_sum == 0, f32(1), energy_sum)
    peak_in = jnp.where(valid, avg_band, f32(0))
    avg_freq = _band_to_freq(avg_band, consts)
    peak_out_raw = _freq_to_band(map_freq(avg_freq, controls, flags), consts)
    peak_out = jnp.where(valid, peak_out_raw, jnp.float32(np.inf))

    # --- updateOutputMap --------------------------------------------------
    # k[b] = #peaks with output <= b.  searchsorted lowers to a binary-search
    # gather loop on TPU (~60x slower than this): scatter one count per peak
    # at cell ceil(output) and take the inclusive prefix sum.
    cells = jnp.where(valid,
                      jnp.clip(jnp.ceil(peak_out), 0, B).astype(jnp.int32),
                      jnp.int32(B))
    hist = jnp.zeros(B + 1, jnp.int32).at[cells].add(1)
    k = jnp.cumsum(hist[:B])
    last = jnp.maximum(n_peaks - 1, 0)
    first_in, first_out = peak_in[0], peak_out[0]
    last_in = peak_in[last]
    last_out = jnp.where(valid[last], peak_out[last], f32(0))
    prev_i = jnp.clip(k - 1, 0, nseg - 1)
    next_i = jnp.clip(k, 0, nseg - 1)
    prev_o, prev_in_ = peak_out[prev_i], peak_in[prev_i]
    next_o, next_in_ = peak_out[next_i], peak_in[next_i]

    range_scale = f32(1) / (next_o - prev_o)
    out_offset = prev_in_ - prev_o
    out_scale = next_in_ - next_o - prev_in_ + prev_o
    grad_scale = out_scale * range_scale
    r = (b_idx - prev_o) * range_scale
    h = r * r * (3 - 2 * r)
    pair_bin = b_idx + out_offset + h * out_scale
    pair_grad = 1 + (6 * r * (1 - r)) * grad_scale

    # top rule runs last in C++ and overwrites from trunc(last.output) (:914)
    top_start = jnp.maximum(jnp.int32(0), last_out.astype(jnp.int32))
    is_top = jnp.arange(B) >= top_start
    is_bottom = (k == 0) & ~is_top

    input_bin = jnp.where(is_top, b_idx + (last_in - last_out),
                          jnp.where(is_bottom, b_idx + (first_in - first_out),
                                    pair_bin))
    freq_grad = jnp.where(is_top | is_bottom, f32(1), pair_grad)

    no_peaks = n_peaks == 0
    input_bin = jnp.where(no_peaks, b_idx, input_bin)
    freq_grad = jnp.where(no_peaks, f32(1), freq_grad)
    return input_bin, freq_grad


# ---------------------------------------------------------------------------
# Pitch estimation (signalsmith-stretch.h:927-968)
# ---------------------------------------------------------------------------
def _top3_local_maxima(metric):
    """Insertion scan for the top-3 local maxima (:931-948).

    metric [..., B]; returns (i0, v0, i1, v1, i2, v2) with leading dims
    preserved (the scan is over bins, vectorized over everything else)."""
    B = metric.shape[-1]
    lead = metric.shape[:-1]
    m_prev = jnp.moveaxis(metric[..., :-2], -1, 0)
    m_cur = jnp.moveaxis(metric[..., 1:-1], -1, 0)
    m_next = jnp.moveaxis(metric[..., 2:], -1, 0)
    b_arr = jnp.arange(1, B - 1, dtype=jnp.int32)

    def step(state, xs):
        i0, v0, i1, v1, i2, v2 = state
        b, e, ep, en = xs
        is_max = ~(e < ep) & ~(e <= en)
        gt0, gt1, gt2 = e > v0, e > v1, e > v2
        # replicate the insertion ladder (:937-947)
        n_i0 = jnp.where(is_max & gt0 & gt1, i1, jnp.where(is_max & gt0, b, i0))
        n_v0 = jnp.where(is_max & gt0 & gt1, v1, jnp.where(is_max & gt0, e, v0))
        n_i1 = jnp.where(is_max & gt0 & gt1 & gt2, i2,
                         jnp.where(is_max & gt0 & gt1, b, i1))
        n_v1 = jnp.where(is_max & gt0 & gt1 & gt2, v2,
                         jnp.where(is_max & gt0 & gt1, e, v1))
        n_i2 = jnp.where(is_max & gt0 & gt1 & gt2, b, i2)
        n_v2 = jnp.where(is_max & gt0 & gt1 & gt2, e, v2)
        return (n_i0, n_v0, n_i1, n_v1, n_i2, n_v2), None

    zi = jnp.zeros(lead, jnp.int32)
    init = (zi, metric[..., 0], zi, metric[..., 0], zi, metric[..., 0])
    state, _ = jax.lax.scan(step, init, (b_arr, m_cur, m_prev, m_next))
    return state


def _peak_estimate(i0, v0, i1, v1, i2, v2):
    """Harmonic-spacing heuristic (:950-959) -> (peakEstimate, weight)."""
    pe = i2
    c1 = v1 > v2 * f32(0.1)
    diff = jnp.abs(pe - i1)
    ok1 = c1 & (diff > pe // 8) & (diff < pe * 7 // 8)
    pe = jnp.where(ok1, pe % jnp.maximum(diff, 1), pe)
    c2 = c1 & (v0 > v2 * f32(0.01))
    diff2 = jnp.abs(pe - i0)
    ok2 = c2 & (diff2 > pe // 8) & (diff2 < pe * 7 // 8)
    pe = jnp.where(ok2, pe % jnp.maximum(diff2, 1), pe)
    return pe, v2


def _estimate_frequency(metric, carry: SpectralCarry):
    """Full per-block estimate with the exponential smoothing state (:960-965)."""
    pe, weight = _peak_estimate(*_top3_local_maxima(metric))
    few = carry.freq_est_weighted + (pe.astype(jnp.float32) * weight
                                     - carry.freq_est_weighted) * f32(0.25)
    fw = carry.freq_est_weight + (weight - carry.freq_est_weight) * f32(0.25)
    est = few / (fw + f32(1e-30))
    return est, few, fw


# ---------------------------------------------------------------------------
# Formants (signalsmith-stretch.h:970-1036)
# ---------------------------------------------------------------------------
def _update_formants(in_energy, carry, controls, flags, consts):
    B = consts.bands
    metric = jnp.sum(in_energy, axis=0)  # [B]

    if flags.formant_auto:
        est, few, fw = _estimate_frequency(metric, carry)
        use_base = controls.formant_base_freq > 0
        freq_estimate = jnp.where(
            use_base, _freq_to_band(controls.formant_base_freq, consts), est)
        # estimateFrequency() side effects only happen when it is called (:983)
        few = jnp.where(use_base, carry.freq_est_weighted, few)
        fw = jnp.where(use_base, carry.freq_est_weight, fw)
    else:
        freq_estimate = _freq_to_band(controls.formant_base_freq, consts)
        few, fw = carry.freq_est_weighted, carry.freq_est_weight

    decay = f32(1) - f32(1) / (freq_estimate * f32(0.5) + f32(1))
    env = metric
    e = jnp.float32(0)
    for _ in range(2):
        env, e = scan_ops.decay_max_backward(env, e, decay)
        env, e = scan_ops.decay_max_forward(env, e, decay)
    inv_decay = f32(1) / decay
    for _ in range(2):
        env, e = scan_ops.decay_min_backward(env, e, inv_decay)
        env, e = scan_ops.decay_min_forward(env, e, inv_decay)

    # energy rescale (:1008-1034); envelope padded with 2 zeros like the C++
    env_pad = jnp.concatenate([env, jnp.zeros(2, env.dtype)])
    input_f = jnp.asarray(consts.band_freq)
    output_f = map_freq(input_f, controls, flags) if flags.formant_compensation else input_f
    output_f = inv_map_formant(output_f, controls)
    target_band = _freq_to_band(output_f, consts)

    tb = jnp.minimum(target_band, f32(B))
    floor_band = jnp.floor(tb).astype(jnp.int32)
    frac = tb - floor_band.astype(jnp.float32)
    lo = env_pad[jnp.clip(floor_band, 0, B + 1)]
    hi = env_pad[jnp.clip(floor_band + 1, 0, B + 1)]
    target_e = jnp.where(target_band < 0, f32(0), lo + (hi - lo) * frac)

    ratio = target_e / (env + f32(1e-30))
    return in_energy * ratio, few, fw


# ---------------------------------------------------------------------------
# Main prediction sweep (signalsmith-stretch.h:722-803)
# ---------------------------------------------------------------------------
def _make_output(energy, fallback_input, phase):
    pn = phase.real ** 2 + phase.imag ** 2
    weak = pn <= f32(NOISE_FLOOR)
    fn = fallback_input.real ** 2 + fallback_input.imag ** 2
    phase2 = jnp.where(weak, fallback_input, phase)
    pn2 = jnp.where(weak, fn + f32(NOISE_FLOOR), pn)
    return phase2 * jnp.sqrt(energy / pn2)


def _main_prediction(inp, out_prelim, pred_energy, pred_input, input_bin,
                     time_factor, rng, consts: SpectralConsts,
                     flags: SpectralFlags = None):
    """Sequential bin sweep with vectorized precomputation.

    inp:         [ch, B] complex input spectrum (unchanged by the sweep)
    out_prelim:  [ch, B] outputs written by the preliminary prediction
    pred_energy: [ch, B], pred_input: [ch, B] (Prediction state, this block)
    input_bin:   [B] outputMap inputBin
    Returns new outputs [ch, B].
    """
    ch, B = out_prelim.shape
    longv = consts.long_vertical_step
    b_idx = jnp.arange(B)

    tf = jnp.maximum(time_factor, f32(1.0 / MAX_CLEAN_STRETCH))
    random_tf = tf > f32(MAX_CLEAN_STRETCH)
    lo = f32(MAX_CLEAN_STRETCH) * 2 * random_tf.astype(jnp.float32) - tf
    if flags is not None and flags.random_engine is not None:
        draws = draw_uniform(flags, rng, (2, B), lo, tf)
    else:
        draws = jax.random.uniform(rng, (2, B), jnp.float32,
                                   minval=lo, maxval=tf)
    btf1 = jnp.where(random_tf, draws[0], tf)   # up-vote branch draw (:749)
    btf2 = jnp.where(random_tf, draws[1], tf)   # down-vote branch draw (:769)

    max_ch = jnp.argmax(pred_energy, axis=0)            # first max wins (:729-737)
    pe_max = jnp.take_along_axis(pred_energy, max_ch[None], 0)[0]
    pi_max = jnp.take_along_axis(pred_input, max_ch[None], 0)[0]

    def frac_gather_maxch(pos):
        low = jnp.floor(pos)
        li = low.astype(jnp.int32)
        frac = pos - low
        def g(idx):
            valid = (idx >= 0) & (idx < B)
            v = inp[max_ch, jnp.clip(idx, 0, B - 1)]
            return jnp.where(valid, v, jnp.zeros((), inp.dtype))
        lo_v = g(li)
        hi_v = g(li + 1)
        return lo_v + (hi_v - lo_v) * frac

    # upward votes: twists for this bin against bins below (:747-762)
    short_down = frac_gather_maxch(input_bin - btf1)
    long_down = frac_gather_maxch(input_bin - f32(longv) * btf1)
    short_twist = pi_max * jnp.conj(short_down)
    long_twist = pi_max * jnp.conj(long_down)

    # downward votes: prelim outputs of bins above, fully precomputable (:764-786)
    in_bin_up1 = jnp.roll(input_bin, -1)
    in_bin_upl = jnp.roll(input_bin, -longv)
    pi_up1 = jnp.take_along_axis(pred_input, jnp.minimum(b_idx + 1, B - 1)[None].repeat(ch, 0), 1)
    pi_up1 = jnp.take_along_axis(pi_up1, max_ch[None], 0)[0]
    pi_upl = jnp.take_along_axis(pred_input, jnp.minimum(b_idx + longv, B - 1)[None].repeat(ch, 0), 1)
    pi_upl = jnp.take_along_axis(pi_upl, max_ch[None], 0)[0]
    up_short_down = frac_gather_maxch(in_bin_up1 - btf2)
    up_long_down = frac_gather_maxch(in_bin_upl - f32(longv) * btf2)
    up_twist = pi_up1 * jnp.conj(up_short_down)
    up_long_twist = pi_upl * jnp.conj(up_long_down)

    out_up1 = jnp.take_along_axis(out_prelim, jnp.minimum(b_idx + 1, B - 1)[None].repeat(ch, 0), 1)
    out_up1 = jnp.take_along_axis(out_up1, max_ch[None], 0)[0]
    out_upl = jnp.take_along_axis(out_prelim, jnp.minimum(b_idx + longv, B - 1)[None].repeat(ch, 0), 1)
    out_upl = jnp.take_along_axis(out_upl, max_ch[None], 0)[0]
    phase_up = (jnp.where(b_idx < B - 1, out_up1 * jnp.conj(up_twist), 0)
                + jnp.where(b_idx < B - longv, out_upl * jnp.conj(up_long_twist), 0))

    # channel phase locking twists (:791-800)
    ch_twist = pred_input * jnp.conj(pi_max)[None, :]

    return _run_sweep(short_twist, long_twist, phase_up, pe_max, pi_max,
                      max_ch, ch_twist, pred_energy, pred_input,
                      ch=ch, longv=longv)


def _sweep_scan(short_twist, long_twist, phase_up, pe_max, pi_max, max_ch,
                ch_twist, pred_energy, pred_input, *, ch, longv):
    """Reference lax.scan sweep (portable path; Pallas kernel on TPU)."""
    B = short_twist.shape[-1]
    b_idx = jnp.arange(B)
    has_down1 = b_idx > 0
    has_downl = b_idx >= longv

    def sweep(window, xs):
        (st, lt, pu, pe_m, pi_m, mc, ct, pe_all, pi_all, hd1, hdl) = xs
        # window: [ch, longv] newest at [..., -1]
        down1 = window[mc, -1]
        downl = window[mc, 0]
        phase = pu + jnp.where(hd1, down1 * st, 0) + jnp.where(hdl, downl * lt, 0)
        out_main = _make_output(pe_m, pi_m, phase)
        locked = _make_output(pe_all, pi_all, out_main * ct)
        out_c = jnp.where(jnp.arange(window.shape[0]) == mc, out_main, locked)
        new_window = jnp.concatenate([window[:, 1:], out_c[:, None]], axis=1)
        return new_window, out_c

    xs = (short_twist, long_twist, phase_up, pe_max, pi_max, max_ch,
          ch_twist.T, pred_energy.T, pred_input.T, has_down1, has_downl)
    init = jnp.zeros((ch, longv), jnp.complex64)
    _, outputs = jax.lax.scan(sweep, init, xs)
    return outputs.T  # [ch, B]


def _run_sweep(short_twist, long_twist, phase_up, pe_max, pi_max, max_ch,
               ch_twist, pred_energy, pred_input, *, ch, longv):
    # A per-block Pallas prediction kernel (ops/pallas/prediction.py, removed
    # in round 4 — see git history @ 69726a8) was bit-exact vs this scan but
    # slower everywhere measured: Mosaic DMA runs ~200 MB/s on the
    # relay-attached TPU, and the round-4 fused batched variant measured
    # 399.7 ms vs 125.8 ms for the XLA wavefront at bench shapes (docs/
    # DESIGN.md "Pallas verdicts").  The production fast path is the
    # wavefront engine (wavefront.py), which needs no kernel; this scan
    # serves the per-block scan engine.
    return _sweep_scan(short_twist, long_twist, phase_up, pe_max, pi_max,
                       max_ch, ch_twist, pred_energy, pred_input,
                       ch=ch, longv=longv)


# ---------------------------------------------------------------------------
# The block step
# ---------------------------------------------------------------------------
def process_block(carry: SpectralCarry, xs: BlockInputs, controls: Controls,
                  flags: SpectralFlags, consts: SpectralConsts):
    """One spectral block; returns (carry', output_spectrum [ch, B])."""
    B = consts.bands
    new = xs.new_spectrum

    inp = jnp.where(new, xs.spectrum, carry.input)
    prev_in = jnp.where(xs.reanalyse, xs.prev_spectrum, carry.prev_input)

    rotor = jnp.asarray(consts.rotor)
    output = jnp.where(new, carry.output * rotor, carry.output)
    prev_in = jnp.where(new, prev_in * rotor, prev_in)

    in_energy = inp.real ** 2 + inp.imag ** 2       # [ch, B]
    b_f = jnp.arange(B, dtype=jnp.float32)

    if flags.mapped:
        energy = jnp.sum(in_energy, axis=0)
        smoothed = _smooth_energy(energy, consts)
        input_bin, freq_grad = _peaks_and_map(energy, smoothed, controls,
                                              flags, consts)
    else:
        input_bin, freq_grad = b_f, jnp.ones(B, jnp.float32)

    few, fw = carry.freq_est_weighted, carry.freq_est_weight
    if flags.process_formants:
        in_energy, few, fw = _update_formants(in_energy, carry, controls,
                                              flags, consts)

    # --- preliminary phase-vocoder prediction (:697-719) -------------------
    low = jnp.floor(input_bin)
    li = low.astype(jnp.int32)
    frac = input_bin - low
    li_b = jnp.broadcast_to(li, (consts.channels, B))
    frac_b = frac[None, :]
    pred_energy = _frac_gather(in_energy, li_b, frac_b)
    pred_energy = pred_energy * jnp.maximum(f32(0), freq_grad)[None, :]
    pred_input = _frac_gather(inp, li_b, frac_b)
    prev_interp = _frac_gather(prev_in, li_b, frac_b)
    freq_twist = pred_input * jnp.conj(prev_interp)
    phase = output * freq_twist
    out_prelim = phase / (jnp.maximum(carry.pred_energy, pred_energy)
                          + f32(NOISE_FLOOR))

    # --- main prediction (:722-803) ----------------------------------------
    rng, sub = jax.random.split(carry.rng)
    outputs = _main_prediction(inp, out_prelim, pred_energy, pred_input,
                               input_bin, xs.time_factor, sub, consts, flags)

    # --- prevInput <- input (:806-812) -------------------------------------
    prev_final = jnp.where(new, inp, prev_in)

    carry2 = SpectralCarry(input=inp, prev_input=prev_final, output=outputs,
                           pred_energy=pred_energy,
                           freq_est_weighted=few, freq_est_weight=fw, rng=rng)
    return carry2, outputs
