"""Batched spectral planner: stages a-f of processSpectrum for all blocks.

Split out of wavefront.py (round 5): the per-(block, bin) SweepInputs
coefficient build (reference signalsmith-stretch.h:642-803) in both complex
(CPU probe-parity) and planar-f32-pair (TPU) forms.  The diagonal sweep that
consumes SweepInputs stays in wavefront.py.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spectral
from .config import MAX_CLEAN_STRETCH, NOISE_FLOOR
from .ops import scan_ops
from .ops.interp import (_WindowInterp, _interp_gather, _interp_mode,
                         _interp_shift, _interp_shift_static,
                         _peaks_and_map_batched, _window_geometry)

f32 = np.float32

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
        if (tb.ndim > 1 and _interp_mode() == "window"
                and flags.inv_grad_bound is not None):
            geom_f = _window_geometry(flags.inv_grad_bound, 0.0)
            if geom_f is not None:
                finterp = _WindowInterp(*geom_f)
        if tb.ndim == 1 and _interp_mode() == "window":
            # Non-automated formants: the target positions are ONE [B]
            # vector shared by every block, so the envelope lookup is a
            # banded matmul on the MXU — two exact one-hot selections (lo
            # taps, and the same matrix against a one-bin-shifted env for
            # hi) and the gather path's lerp expression.  Bit-identical to
            # the clipped-take fallback: a negative floor matches no
            # one-hot row, so lo = hi = 0 and the target_band < 0 mask
            # zeroes it the same way.  Replaces a per-row windowed interp
            # that measured 379 ms at bench shapes (tools/exp_formant.py)
            # with ~2x 463 GFLOP of matmul (~5 ms).
            flo_f = jnp.floor(tb)                           # [B]
            fr = tb - flo_f
            rows_f = jnp.arange(B + 128, dtype=jnp.float32)
            Wlo = (rows_f[:, None] == flo_f[None, :]).astype(jnp.float32)
            env_hi = jnp.concatenate(
                [env_pad[:, 1:], jnp.zeros((nB, 1), env_pad.dtype)], -1)
            lo = jnp.einsum("rn,nj->rj", env_pad, Wlo,
                            precision=jax.lax.Precision.HIGHEST)
            hi = jnp.einsum("rn,nj->rj", env_hi, Wlo,
                            precision=jax.lax.Precision.HIGHEST)
            target_e = jnp.where(target_band < 0, f32(0),
                                 lo + (hi - lo) * fr[None, :])
        elif finterp is not None:
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

    prod_first = pairm and not any_random
    if vote_vals is not None:
        if any_random:
            sd, ld, us, ul = vote_vals
        else:
            sd, ld = vote_vals
            if not prod_first:
                us = [cmap1(lambda x: _shift_up(x, 1), v) for v in sd]
                ul = [cmap1(lambda x: _shift_up(x, longv), v) for v in ld]
        if debug:
            dbg["interp_violations"] = interp.violations + finterp_violations
    elif prod_first:
        sd = [None] * ch
        ld = [None] * ch
        for c in range(ch):
            sd[c], ld[c], _, _ = vote_gathers(
                cmap1(lambda z, c=c: z[:, c], input_eff))
    else:
        sd = [None] * ch
        ld = [None] * ch
        us = [None] * ch
        ul = [None] * ch
        for c in range(ch):
            sd[c], ld[c], us[c], ul[c] = vote_gathers(
                cmap1(lambda z, c=c: z[:, c], input_eff))
    b_idx = jnp.arange(B)
    if prod_first:
        # PRODUCT-FIRST vote build (ported from _plan_tail_pair, round 5):
        # every factor of a vote coefficient is shifted by the same offset
        # and selected by the same mc[b], so the per-channel products are
        # formed UNSHIFTED and one shift + one select produces each
        # coefficient — one plane materialization per vote instead of
        # three shifted+selected operands.  Bit-identical: the float ops
        # per bin are unchanged, the shifts' zero tails are exactly the
        # masked bins, and select-then-multiply == multiply-then-select
        # under one mc.  Only valid when the up positions are shifts of
        # the down positions (non-random regime, :764-786).
        psd = [cmulc(pi[c], sd[c]) for c in range(ch)]
        pld = [cmulc(pi[c], ld[c]) for c in range(ch)]
        d1 = cwhere0(b_idx > 0, csel(mc, psd))
        d2 = cwhere0(b_idx >= longv, csel(mc, pld))
        t1 = [cmulc(c1[c], psd[c]) for c in range(ch)]
        t2 = [cmulc(c1[c], pld[c]) for c in range(ch)]
        a1 = cwhere0(b_idx < B - 1, csel(
            mc, [cmap1(lambda x: _shift_up(x, 1), t) for t in t1]))
        a2 = cwhere0(b_idx < B - longv, csel(
            mc, [cmap1(lambda x: _shift_up(x, longv), t) for t in t2]))
    else:
        short_down = csel(mc, sd)
        long_down = csel(mc, ld)
        up_short = csel(mc, us)
        up_long = csel(mc, ul)

        d1 = cmulc(pi_max, short_down)
        d2 = cmulc(pi_max, long_down)
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


