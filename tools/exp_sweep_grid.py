#!/usr/bin/env python
"""Grid the sweep's (SST_SWEEP_UNROLL K, SST_SWEEP_GROUP GR) at bench shapes.

Total sequential diagonals = nG * (B + (GR-1)*step): bigger groups mean
FEWER scan steps but MORE xs wing bytes — round 2 chose GR=128 on bytes
alone (TPU timing was pending).  This measures the actual tradeoff.
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

from signalsmith_stretch_tpu import wavefront
from signalsmith_stretch_tpu.wavefront import SweepInputs


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "418"))
    B = int(os.environ.get("SST_BANDS", "4096"))
    ch = 2
    longv = 6

    @jax.jit
    def gen(key):
        c = jax.random.normal(key, (batch, 8, nB, B), jnp.float32)

        def c64(i):
            return jax.lax.complex(c[:, 2 * i], c[:, 2 * i + 1])

        pi = tuple(c64(2 + i) for i in range(ch))
        pe = tuple(p.real ** 2 + p.imag ** 2 for p in pi)
        return SweepInputs(a1=c64(0), a2=c64(1), d1=c64(0), d2=c64(1),
                           mc=jnp.zeros((batch, nB, B), jnp.int32),
                           pe=pe, pi=pi)

    inputs = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    grid = os.environ.get(
        "SST_GRID", "32:128,32:256,32:512,64:128,64:512,128:512")
    for spec in grid.split(","):
        k_s, gr_s = spec.split(":")
        os.environ["SST_SWEEP_UNROLL"] = k_s
        os.environ["SST_SWEEP_GROUP"] = gr_s
        K = int(k_s)
        fn = wavefront._sweep_unskew_fn(longv, ch, True, B, K)

        @jax.jit
        def f_full(inp):
            return jnp.sum(jnp.abs(jax.vmap(fn)(inp)))

        try:
            dt, cs = timed(f_full, inputs)
            print(f"K={k_s:>4} GR={gr_s:>4}: {dt*1e3:7.1f} ms"
                  f" (compile {cs:.0f}s)", flush=True)
        except Exception as e:  # OOM etc.
            print(f"K={k_s:>4} GR={gr_s:>4}: FAILED {type(e).__name__}:"
                  f" {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
