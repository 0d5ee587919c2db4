#!/usr/bin/env python
"""Benchmark: batched stereo 48 kHz time-stretch throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches the BASELINE north star: batched 10 s stereo 48 kHz clips,
presetDefault, 1.25x stretch; baseline target = 2000x realtime per chip.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from signalsmith_stretch_tpu import engine, spectral  # noqa: E402
from signalsmith_stretch_tpu.config import StretchConfig  # noqa: E402
from signalsmith_stretch_tpu.parallel import batch as pbatch  # noqa: E402


def main():
    batch = int(os.environ.get("SST_BENCH_BATCH", "32"))
    seconds = float(os.environ.get("SST_BENCH_SECONDS", "10"))
    rate = 48000
    time_factor = 1.25
    reps = int(os.environ.get("SST_BENCH_REPS", "3"))

    cfg = StretchConfig.preset_default(2, rate)
    in_len = int(rate * seconds)
    out_len = int(round(in_len * time_factor))

    rng = np.random.default_rng(0)
    t = np.arange(in_len) / rate
    base = (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(in_len))
    clips = np.stack([np.stack([base, np.roll(base, 5)])] * batch).astype(np.float32)
    clips += 0.01 * rng.standard_normal(clips.shape).astype(np.float32)

    plan = engine.build_exact_plan(cfg, in_len, out_len)
    controls = spectral.Controls.make()
    flags = spectral.SpectralFlags(mapped=False, process_formants=False,
                                   formant_compensation=False)

    base = pbatch.batch_render(plan, flags)
    # Reduce to an on-device checksum: block_until_ready is unreliable on the
    # relay-attached backend and bulk device->host transfer is slow; a float()
    # of a jitted scalar is the only trustworthy sync point.
    fn = jax.jit(lambda x, c, s: jnp.sum(jnp.abs(base(x, c, s))))
    seeds = jnp.arange(batch, dtype=jnp.int32)
    x = jax.device_put(jnp.asarray(clips))

    v = fn(x, controls, seeds)
    float(v)  # compile + warmup + sync

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        v = fn(x, controls, seeds)
        float(v)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * seconds
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "realtime_factor_stereo48k_stretch1.25_batch%d" % batch,
        "value": round(rtf, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
