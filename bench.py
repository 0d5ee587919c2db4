#!/usr/bin/env python
"""Benchmark: batched stereo 48 kHz throughput per chip + BASELINE configs.

Prints ONE JSON line for the driver:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
and writes the full per-config report to bench_report.json.

Timing notes (this environment): block_until_ready is unreliable and bulk
device->host transfer runs ~30 MB/s through the relay, so every measurement
syncs via float() of an on-device checksum.  There is a fixed ~25 ms dispatch
round-trip; batches are sized to dominate it.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

# persistent TPU compile cache (separate from the CPU test cache; see
# tests/conftest.py note) -- first-run compiles at bench shapes take minutes
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from signalsmith_stretch_tpu.models import StretchModel  # noqa: E402


def make_corpus(batch, channels, in_len, rate, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(in_len) / rate
    base = (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(in_len))
    clips = np.stack([np.stack([np.roll(base, 13 * c + 7 * b)
                                for c in range(channels)])
                      for b in range(batch)]).astype(np.float32)
    clips += 0.01 * rng.standard_normal(clips.shape).astype(np.float32)
    return clips


def run_config(name, model, clips, rate, reps):
    """Steady-state throughput: `reps` batches dispatched back-to-back with
    ONE final sync, the way a production pipeline feeds the chip (JAX async
    dispatch keeps the device busy; the host never blocks per batch).  The
    relay's fixed ~26 ms sync round-trip is thereby amortized across the
    run instead of taxing every batch; single-batch latency (sync per call)
    is reported separately."""
    batch = clips.shape[0]
    seeds = jnp.arange(batch, dtype=jnp.int32)

    @jax.jit
    def fn(x, s):
        return jnp.sum(jnp.abs(model.batched(x, s)))

    x = jax.device_put(jnp.asarray(clips))
    t0 = time.perf_counter()
    float(fn(x, seeds))
    compile_s = time.perf_counter() - t0
    lat = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(x, seeds))
        lat.append(time.perf_counter() - t0)
    n = max(reps, 4)
    t0 = time.perf_counter()
    outs = [fn(x, seeds) for _ in range(n)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / n
    audio_seconds = batch * clips.shape[2] / rate
    return dict(name=name, batch=batch, seconds=round(dt, 4),
                latency_seconds=round(min(lat), 4),
                compile_seconds=round(compile_s, 1),
                audio_seconds=audio_seconds,
                realtime_factor=round(audio_seconds / dt, 1))


def main():
    batch = int(os.environ.get("SST_BENCH_BATCH", "32"))
    seconds = float(os.environ.get("SST_BENCH_SECONDS", "10"))
    reps = int(os.environ.get("SST_BENCH_REPS", "3"))
    # default: primary config only (driver-friendly); SST_BENCH_FULL=1 runs
    # all five baseline configurations into bench_report.json
    quick = os.environ.get("SST_BENCH_FULL") != "1"

    results = []

    def cfg_case(name, rate, channels, time_factor, cfg_batch=None, **build_kw):
        in_len = int(rate * seconds)
        out_len = int(round(in_len * time_factor))
        model = StretchModel.build(channels=channels, sample_rate=rate,
                                   in_samples=in_len, out_samples=out_len,
                                   **build_kw)
        clips = make_corpus(cfg_batch or batch, channels, in_len, rate)
        results.append(run_config(name, model, clips, rate, reps))

    # BASELINE.json configs (mapped configs run at the full bench batch since
    # the windowed-interp layout fix: every matmul operand keeps a 128-
    # multiple minor dim, so memory scales ~linearly with batch).  The quick
    # (driver) run also measures the pitch+12 mapped config so mapped-path
    # regressions stay visible round to round (VERDICT r2 #4).
    cfg_case("stereo48k_default_1.25x", 48000, 2, 1.25)
    cfg_case("stereo48k_pitch+12_tonality8k", 48000, 2, 1.0,
             semitones=12, tonality_hz=8000)
    if not quick:
        cfg_case("mono44k_cheaper_1.25x", 44100, 1, 1.25, cheaper=True)
        cfg_case("formant_vocal_shift", 48000, 2, 1.0, semitones=5,
                 tonality_hz=8000, formant_semitones=3,
                 formant_compensation=True, formant_base_hz=220)
        cfg_case("stretch0.8x_custom_sweep", 48000, 2, 0.8, semitones=-3,
                 tonality_hz=6000)
        cfg_case("split_streaming_parity", 48000, 2, 1.25, split=True)

    primary = results[0]
    mapped = results[1]
    if not quick:  # keep the committed full report intact on quick runs
        report = dict(configs=results,
                      batch=batch, clip_seconds=seconds,
                      engine=os.environ.get("SST_ENGINE", "wavefront"),
                      device=str(jax.devices()[0]))
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_report.json"), "w") as f:
            json.dump(report, f, indent=1)

    print(json.dumps({
        "metric": "realtime_factor_stereo48k_stretch1.25_batch%d" % batch,
        "value": primary["realtime_factor"],
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(primary["realtime_factor"] / 2000.0, 3),
        "mapped_metric": "realtime_factor_pitch+12_batch%d" % batch,
        "mapped_value": mapped["realtime_factor"],
    }))


if __name__ == "__main__":
    main()
