#!/usr/bin/env python
"""Measure Pallas/Mosaic on this TPU attachment: plain copy bandwidth,
lane-rotated copy, and a skew-shaped per-row-offset write.

Round-2 notes called Mosaic DMA "~200 MB/s through this relay: a dead end";
VERDICT round 2 asks for a measured resolution.  This harness times:
  1. jnp baseline copy (x + 0)
  2. pallas copy, grid over rows, block = one row
  3. pallas lane-rotated copy (static per-row shift via jnp.roll in-kernel)
  4. pallas skew write: row r lands at column offset r*step in a padded row
"""
import functools
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
from jax.experimental import pallas as pl


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    # skew-shaped problem: rows=512 blocks, inner [batch*P? -> flat..], cols
    R, C = 512, 12 * 32 * 4096 // 32   # keep one row ~ 6 MB / 32 slabs
    step = 7
    x = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (R, C), jnp.float32))(
            jax.random.PRNGKey(0)))
    bytes_rw = 2 * x.size * 4

    @jax.jit
    def base(x):
        return jnp.sum(x + 1.0)

    dt, cs = timed(base, x)
    print(f"jnp copy+sum     {dt*1e3:8.1f} ms  ~{bytes_rw/dt/1e9:6.0f} GB/s"
          f" (compile {cs:.0f}s)", flush=True)

    def copy_kernel(xr, yr):
        yr[...] = xr[...]

    @jax.jit
    def pcopy(x):
        y = pl.pallas_call(
            copy_kernel,
            grid=(R // 8,),
            in_specs=[pl.BlockSpec((8, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x)
        return jnp.sum(y)

    dt, cs = timed(pcopy, x)
    print(f"pallas copy      {dt*1e3:8.1f} ms  ~{bytes_rw/dt/1e9:6.0f} GB/s"
          f" (compile {cs:.0f}s)", flush=True)

    def rot_kernel(xr, yr):
        i = pl.program_id(0)
        yr[...] = jnp.roll(xr[...], (i * step) % 128, axis=-1)

    @jax.jit
    def prot(x):
        y = pl.pallas_call(
            rot_kernel,
            grid=(R // 8,),
            in_specs=[pl.BlockSpec((8, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x)
        return jnp.sum(y)

    dt, cs = timed(prot, x)
    print(f"pallas rot-copy  {dt*1e3:8.1f} ms  ~{bytes_rw/dt/1e9:6.0f} GB/s"
          f" (compile {cs:.0f}s)", flush=True)

    # skew write: one row per grid step, written into a D-wide padded row at
    # static offset r*step (dynamic store within the block)
    D = C + (R - 1) * step
    Dp = -(-D // 128) * 128

    def skew_kernel(xr, yr):
        i = pl.program_id(0)
        yr[...] = jnp.zeros_like(yr)
        off = (i * step) % 128          # block-aligned part handled by index
        yr[0, pl.dslice(off, C)] = xr[0, :]

    @jax.jit
    def pskew(x):
        y = pl.pallas_call(
            skew_kernel,
            grid=(R,),
            in_specs=[pl.BlockSpec((1, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, Dp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, Dp), jnp.float32),
        )(x)
        return jnp.sum(y)

    skew_bytes = (x.size + R * Dp) * 4
    dt, cs = timed(pskew, x)
    print(f"pallas skew      {dt*1e3:8.1f} ms  ~{skew_bytes/dt/1e9:6.0f} GB/s"
          f" (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
