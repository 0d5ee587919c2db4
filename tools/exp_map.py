#!/usr/bin/env python
"""Component timings of _peaks_and_map_batched at bench shapes (batch 8).

Energy/smoothed are runtime inputs (no constant folding).  Mirrors the
stages of wavefront._peaks_and_map_batched incrementally.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import spectral, wavefront
from signalsmith_stretch_tpu.models import StretchModel
from signalsmith_stretch_tpu.ops import scan_ops

f1 = jnp.float32
f32 = np.float32


def timed(fn, *a, reps=5):
    t0 = time.perf_counter()
    float(fn(*a))
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), cs


def main():
    batch = int(os.environ.get("SST_EXP_BATCH", "8"))
    model = StretchModel.build(channels=2, sample_rate=48000,
                               in_samples=480000, out_samples=480000,
                               semitones=12, tonality_hz=8000)
    consts = model.plan.consts
    controls, flags = model.controls, model.flags
    nB = len(model.plan.arrays["new_spectrum"])
    B = consts.bands
    geom = wavefront._window_geometry(flags.inv_grad_bound or 4.0, 6.0)
    nseg = B // 2 + 2
    print(f"nB={nB} B={B} nseg={nseg} geom={geom}", flush=True)

    rng = np.random.default_rng(0)
    energy_np = (rng.standard_normal((batch, nB, B)) ** 2).astype(np.float32)
    energy = jax.device_put(jnp.asarray(energy_np))

    def with_smooth(e):
        sm = e
        acc = jnp.zeros(e.shape[:-1], jnp.float32)
        for _ in range(2):
            sm, acc = scan_ops.iir_backward(sm, acc, f32(consts.slew))
            sm, acc = scan_ops.iir_forward(sm, acc, f32(consts.slew))
        return sm

    def m_smooth(e):
        return jnp.sum(jax.vmap(with_smooth)(e))

    def seg_setup(e, sm):
        above = e > sm
        start = above & jnp.concatenate(
            [jnp.ones((e.shape[0], 1), bool), ~above[:, :-1]], axis=1)
        run_id = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1
        seg = jnp.where(above, run_id, nseg - 1)
        return above, start, run_id, seg

    def m_above(e):
        def one(e1):
            sm = with_smooth(e1)
            above, start, run_id, seg = seg_setup(e1, sm)
            return jnp.sum(run_id) + jnp.sum(seg)
        return jnp.sum(jax.vmap(one)(e))

    def m_segsum(e):
        def one(e1):
            sm = with_smooth(e1)
            above, start, run_id, seg = seg_setup(e1, sm)
            b_idx = jnp.arange(B, dtype=jnp.float32)
            sums = wavefront._segment_sum_runs(
                jnp.stack([b_idx[None] * e1, e1], axis=1), run_id, above, nseg)
            return jnp.sum(sums)
        return jnp.sum(jax.vmap(one)(e))

    def m_hist(e):
        def one(e1):
            sm = with_smooth(e1)
            above, start, run_id, seg = seg_setup(e1, sm)
            n_peaks = jnp.sum((start & above).astype(jnp.int32), axis=1)
            valid = jnp.arange(nseg)[None] < n_peaks[:, None]
            cells = jnp.where(valid, jnp.arange(nseg)[None] % B,
                              jnp.int32(B))
            hist = jax.vmap(
                lambda c: jnp.zeros(B + 128, jnp.int32).at[c].add(1))(cells)
            k = jnp.cumsum(hist[:, :B], axis=1)
            return jnp.sum(k)
        return jnp.sum(jax.vmap(one)(e))

    def m_full(e):
        def one(e1):
            sm = with_smooth(e1)
            ib, fg, bad = wavefront._peaks_and_map_batched(
                e1, sm, controls, flags, consts, geom)
            return jnp.sum(ib) + jnp.sum(fg) + bad
        return jnp.sum(jax.vmap(one)(e))

    for name, fn in [("m:smooth", m_smooth), ("m:above", m_above),
                     ("m:segsum", m_segsum), ("m:hist", m_hist),
                     ("m:full", m_full)]:
        dt, cs = timed(jax.jit(fn), energy)
        print(f"{name:9s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
