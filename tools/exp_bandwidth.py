#!/usr/bin/env python
"""Recalibrate this attachment: dispatch overhead + HBM streaming bandwidth.

Measures (a) an empty-ish jit (scalar add) round trip, (b) copy+sum at
several sizes/shapes, reporting effective GB/s after subtracting the
measured dispatch overhead.
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp


def timed(fn, *a, reps=5):
    float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    disp = timed(jax.jit(lambda s: s + 1.0), jnp.float32(0))
    print(f"dispatch          {disp*1e3:8.2f} ms", flush=True)

    for rows, cols in [(512, 49152), (8192, 4096), (1024, 131072),
                       (65536, 4096), (512, 4096)]:
        x = jax.block_until_ready(
            jax.jit(lambda k: jax.random.normal(k, (rows, cols), jnp.float32))(
                jax.random.PRNGKey(0)))
        f = jax.jit(lambda x: jnp.sum(x + 1.0))
        dt = timed(f, x)
        gb = 2 * x.size * 4 / 1e9
        eff = gb / max(dt - disp, 1e-9)
        print(f"[{rows:6d},{cols:6d}] {x.size*4/1e6:8.0f} MB  {dt*1e3:8.1f} ms"
              f"  raw {gb/dt:6.1f} GB/s  -disp {eff:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
