#!/usr/bin/env python
"""A/B the peaks/output-map merge builder: original 6+5-plane sorts vs the
minimal-payload 2+3-plane sorts (round 5), at mapped bench shapes.

Synthetic but realistic run structure (random energy vs its smoothing);
also checks the two versions agree bitwise on the same inputs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import spectral, wavefront
from signalsmith_stretch_tpu.ops import scan_ops
from tputime import timed


def old_merge(energy, smoothed, controls, flags, consts):
    """Round-4 implementation (6+5 sorted planes), kept for the A/B."""
    f1 = jnp.float32
    nB, B = energy.shape
    above = energy > smoothed
    start = above & jnp.concatenate(
        [jnp.ones((nB, 1), bool), ~above[:, :-1]], axis=1)
    b_idx = jnp.arange(B, dtype=jnp.float32)
    em = jnp.where(above, energy, 0)
    band_sum = wavefront._segmented_run_sums(b_idx[None] * em, start, above)
    energy_sum = wavefront._segmented_run_sums(em, start, above)
    n_peaks = jnp.sum(start.astype(jnp.int32), axis=1)
    avg_band = band_sum / jnp.where(energy_sum == 0, f1(1), energy_sum)
    avg_freq = spectral._band_to_freq(avg_band, consts)
    peak_out_raw = spectral._freq_to_band(
        spectral.map_freq(avg_freq, controls, flags), consts)
    pinf = jnp.float32(np.inf)
    first_in = jnp.min(jnp.where(start, avg_band, pinf), axis=1)
    first_out = jnp.min(jnp.where(start, peak_out_raw, pinf), axis=1)
    last_in = jnp.max(jnp.where(start, avg_band, -pinf), axis=1)
    last_out_r = jnp.max(jnp.where(start, peak_out_raw, -pinf), axis=1)
    has = n_peaks > 0
    last_out = jnp.where(has, last_out_r, f1(0))
    cells = jnp.clip(jnp.ceil(peak_out_raw), 0, B).astype(jnp.int32)
    i_idx = jnp.arange(B, dtype=jnp.int32)[None]
    key_peak = jnp.where(start, (cells << 13) | i_idx, ((B + 1) << 13))
    key_query = (i_idx << 13) | 0x1000
    keys = jnp.concatenate([key_peak,
                            jnp.broadcast_to(key_query, (nB, B))], 1)
    ninf = jnp.float32(-np.inf)
    pinf_f = jnp.float32(np.inf)
    lo_src_o = jnp.concatenate([jnp.where(start, peak_out_raw, ninf),
                                jnp.full((nB, B), ninf)], 1)
    lo_src_i = jnp.concatenate([jnp.where(start, avg_band, ninf),
                                jnp.full((nB, B), ninf)], 1)
    hi_src_o = jnp.concatenate([jnp.where(start, peak_out_raw, pinf_f),
                                jnp.full((nB, B), pinf_f)], 1)
    hi_src_i = jnp.concatenate([jnp.where(start, avg_band, pinf_f),
                                jnp.full((nB, B), pinf_f)], 1)
    qb = jnp.concatenate([jnp.broadcast_to((1 << 13) | i_idx, (nB, B)),
                          jnp.broadcast_to(i_idx, (nB, B))], 1)
    _, lo_src_o, lo_src_i, hi_src_o, hi_src_i, qb = jax.lax.sort(
        [keys, lo_src_o, lo_src_i, hi_src_o, hi_src_i, qb],
        dimension=1, num_keys=1)
    lo_o = jax.lax.cummax(lo_src_o, axis=1)
    lo_i = jax.lax.cummax(lo_src_i, axis=1)
    hi_o = jax.lax.cummin(hi_src_o[:, ::-1], axis=1)[:, ::-1]
    hi_i = jax.lax.cummin(hi_src_i[:, ::-1], axis=1)[:, ::-1]
    _, lo_o, lo_i, hi_o, hi_i = jax.lax.sort(
        [qb, lo_o, lo_i, hi_o, hi_i], dimension=1, num_keys=1)
    lo_v = lo_o[:, :B] > ninf
    hi_v = hi_o[:, :B] < pinf_f
    prev_o, prev_in_ = lo_o[:, :B], lo_i[:, :B]
    next_o, next_in_ = hi_o[:, :B], hi_i[:, :B]
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


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    from signalsmith_stretch_tpu.models import StretchModel
    model = StretchModel.build(channels=2, sample_rate=48000,
                               in_samples=480000, out_samples=480000,
                               semitones=12, tonality_hz=8000)
    plan = model.plan
    consts = plan.consts
    controls, flags = model.controls, model.flags
    nB = len(plan.arrays["new_spectrum"])
    B = consts.bands
    slew = np.float32(consts.slew)

    @jax.jit
    def gen(key):
        e = jax.random.uniform(key, (batch, nB, B), jnp.float32) ** 4
        sm = e
        ee = jnp.zeros((batch, nB), jnp.float32)
        for _ in range(2):
            sm, ee = scan_ops.iir_backward(sm, ee, slew)
            sm, ee = scan_ops.iir_forward(sm, ee, slew)
        return e, sm

    energy, smoothed = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def run_old(e, s):
        def one(en, sm):
            ib, fg, _ = old_merge(en, sm, controls, flags, consts)
            return jnp.sum(ib) + jnp.sum(fg)
        return jnp.sum(jax.vmap(one)(e, s))

    def run_new(e, s):
        def one(en, sm):
            ib, fg, _ = wavefront._peaks_and_map_merge(
                en, sm, controls, flags, consts)
            return jnp.sum(ib) + jnp.sum(fg)
        return jnp.sum(jax.vmap(one)(e, s))

    only = os.environ.get("SST_EXP_ONLY", "")
    if only in ("", "check"):
        # bitwise agreement on one clip (also gated by tests on CPU)
        ib_o, fg_o, _ = jax.jit(
            lambda e, s: old_merge(e, s, controls, flags, consts))(
                energy[0], smoothed[0])
        ib_n, fg_n, _ = jax.jit(
            lambda e, s: wavefront._peaks_and_map_merge(
                e, s, controls, flags, consts))(energy[0], smoothed[0])
        same = (jnp.sum(jnp.abs(ib_o - ib_n)) + jnp.sum(jnp.abs(fg_o - fg_n)))
        print("bitdiff:", float(same), flush=True)

    for name, fn in [("old(6+5)", run_old), ("new(2+3)", run_new)]:
        if only and only not in name:
            continue
        dt, cs = timed(jax.jit(fn), energy, smoothed)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
