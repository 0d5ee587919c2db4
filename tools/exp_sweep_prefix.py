#!/usr/bin/env python
"""Attribute the production sweep's cost by truncated-prefix timing.

Times jax.vmap(_sweep_unskew_fn)(inputs) with SST_SWEEP_STOP at pack /
skew / scan / '' (full) so successive differences attribute cost to the
pack+pad, static skew + transpose, diagonal scan, and unskew+assembly
phases of the REAL production code path (not a replica).

Each stop value is a separate process (the env var is baked at trace
time), so this script re-execs itself per phase.
"""
import os
import subprocess
import sys

PHASES = ["pack", "skew", "scan", ""]

if os.environ.get("_SST_PREFIX_CHILD") != "1":
    here = os.path.abspath(__file__)
    for ph in (sys.argv[1].split(",") if len(sys.argv) > 1 else PHASES):
        env = dict(os.environ, _SST_PREFIX_CHILD="1", SST_SWEEP_STOP=ph)
        subprocess.run([sys.executable, here], env=env, check=True)
    sys.exit(0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

from signalsmith_stretch_tpu import wavefront
from signalsmith_stretch_tpu.wavefront import SweepInputs
from tputime import timed


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "418"))
    B = int(os.environ.get("SST_BANDS", "4096"))
    ch = 2
    longv = 6
    K = int(os.environ.get("SST_SWEEP_UNROLL", "32"))

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
    fn = wavefront._sweep_unskew_fn(longv, ch, True, B, K)

    @jax.jit
    def f(inp):
        res = jax.vmap(fn)(inp)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(res))

    dt, cs = timed(f, inputs)
    name = os.environ.get("SST_SWEEP_STOP") or "full"
    print(f"{name:6s}: {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
