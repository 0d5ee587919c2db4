#!/usr/bin/env python
"""Batch scaling of the full mapped render (stereo48k pitch+12)."""
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

from signalsmith_stretch_tpu.models import StretchModel


def main():
    batches = [int(x) for x in
               os.environ.get("SST_EXP_BATCHES", "8,16,24,32").split(",")]
    rate, secs = 48000, 10.0
    n = int(rate * secs)
    tf = float(os.environ.get("SST_EXP_TIME", "1.0"))
    semi = float(os.environ.get("SST_EXP_SEMI", "12"))
    kw = dict(channels=2, sample_rate=rate, in_samples=n,
              out_samples=int(n * tf), semitones=semi,
              tonality_hz=8000 if semi else 0.0)
    model = StretchModel.build(**kw)
    rng = np.random.default_rng(0)
    for batch in batches:
        clips = rng.standard_normal((batch, 2, n)).astype(np.float32) * 0.1
        x = jax.device_put(jnp.asarray(clips))
        seeds = jnp.arange(batch, dtype=jnp.int32)

        def run(xx, ss):
            return jnp.sum(jnp.abs(model.batched(xx, ss)))

        try:
            t0 = time.perf_counter()
            float(run(x, seeds))
            cs = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x, seeds))
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            rt = batch * secs / dt
            print(f"batch {batch:3d}: {dt*1e3:8.1f} ms  {rt:8.1f}x realtime "
                  f"(compile {cs:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"batch {batch:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        # new batch size => new jit cache entry on the model; drop it
        object.__setattr__(model, "_batched_jit", None)


if __name__ == "__main__":
    main()
