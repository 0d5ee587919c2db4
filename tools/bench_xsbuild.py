#!/usr/bin/env python
"""Benchmark routes for building the sweep xs in packed diagonal-major layout.

Input: P=14 planes as [batch, P, nB, B] (as plan_spectral would produce,
fused into this bench as a random source).  Output target layout:
[S, K/U, U, batch, P, nB] (variant-H packed xs).

Routes:
  r1  pad->merge-reshape->slice->reshape->transpose (current engine style)
  r2  pad->merge->slice->reshape, transpose last two steps separately
  r3  lane-slab consumption check: keep [batch, P, nB, T] and transpose
      slab-by-slab inside a scan (what the fused engine would do)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "417"))
    B = 4096
    P = 14
    longv = 6
    step = longv + 1
    K = int(os.environ.get("SST_K", "32"))
    U = int(os.environ.get("SST_U", "4"))
    D0 = B + (nB - 1) * step
    D = -(-D0 // K) * K
    S = D // K
    route = os.environ.get("SST_ROUTE", "r1")

    src = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
        k, (batch, P, nB, B), jnp.float32))(jax.random.PRNGKey(0)))
    gb = batch * P * nB * D * 4 / 1e9

    if route == "r1":
        @jax.jit
        def build(x):
            T = D + step
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T - B)))
            flat = xp.reshape(batch, P, nB * T)
            sk = flat[:, :, :nB * (T - step)].reshape(batch, P, nB, D)
            sk = jnp.transpose(sk, (3, 0, 1, 2))       # [D, batch, P, nB]
            sk = sk.reshape(S, K // U, U, batch, P, nB)
            return jnp.sum(sk)

    elif route == "r2":
        # transpose first to [D-minor stays]: merge on nB*T then ONE
        # transpose directly into the packed layout
        @jax.jit
        def build(x):
            T = D + step
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T - B)))
            flat = xp.reshape(batch, P, nB * T)
            sk = flat[:, :, :nB * (T - step)].reshape(batch, P, nB, D)
            out = jnp.moveaxis(sk, 3, 0)
            return jnp.sum(out.reshape(S, K // U, U, batch, P, nB))

    elif route == "r3":
        # no global transpose: consume [batch, P, nB, T]-padded planes via
        # lane-window dynamic slices + per-slab transpose inside a scan
        @jax.jit
        def build(x):
            T = D + step
            Tpad = -(-T // 128) * 128
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Tpad - B)))
            flat = xp.reshape(batch, P, nB * Tpad)
            # skew view: row k starts at k*(Tpad) ... need pitch change:
            # keep simple: slice a K-wide diagonal window per outer step via
            # per-k lane offsets is NOT expressible; instead approximate the
            # cost with aligned lane slabs + in-scan transpose:
            def body(c, s0):
                slab = jax.lax.dynamic_slice(
                    xp, (0, 0, 0, s0 * K), (batch, P, nB, K))
                t = jnp.transpose(slab, (3, 0, 1, 2))
                return c + jnp.sum(t), None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(0, (Tpad - K) // K))
            return c

    dt, cs = timed(build, src)
    print(f"route {route}: {dt*1e3:7.1f} ms (compile {cs:.0f}s; "
          f"{2*gb/dt:.0f} GB/s rw-equiv)", flush=True)


if __name__ == "__main__":
    main()
