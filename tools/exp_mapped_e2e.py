#!/usr/bin/env python
"""End-to-end mapped render A/B: peakmap strategy and batch scaling.

Times model.batched (the bench path) for the pitch+12 config under
SST_PEAKMAP=invmap vs merge at batch 32, and invmap at batch 16/8 — if
per-audio-second cost drops markedly below batch 32's, the mapped render
is memory-pressure-bound (spills), which would explain why isolated piece
wins (sorts -94 ms, votes restructure) do not move the full render.
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

from signalsmith_stretch_tpu.models import StretchModel
from tputime import timed


def run(batch, peakmap):
    os.environ["SST_PEAKMAP"] = peakmap
    model = StretchModel.build(channels=2, sample_rate=48000,
                               in_samples=480000, out_samples=600000,
                               semitones=12, tonality_hz=8000)
    rng = np.random.default_rng(0)
    t = np.arange(480000) / 48000
    clip = np.stack([0.3 * np.sin(2 * np.pi * 220 * t)
                     + 0.02 * rng.standard_normal(480000)
                     for _ in range(2)]).astype(np.float32)
    clips = jnp.asarray(np.broadcast_to(clip, (batch, 2, 480000)).copy())
    seeds = jnp.arange(batch, dtype=jnp.int32)
    fn = jax.jit(lambda a, s: jnp.sum(jnp.abs(model.batched(a, s))))
    dt, cs = timed(fn, clips, seeds)
    per_audio = dt / (batch * 10.0)
    print(f"batch={batch:3d} peakmap={peakmap:7s} {dt*1e3:8.1f} ms "
          f"({1.0/per_audio:7.1f}x rt, compile {cs:.0f}s)", flush=True)


def main():
    for batch, pm in [(32, "invmap"), (32, "merge"), (16, "invmap"),
                      (8, "invmap")]:
        run(batch, pm)


if __name__ == "__main__":
    main()
