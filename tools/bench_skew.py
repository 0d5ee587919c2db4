#!/usr/bin/env python
"""Skew (diagonal-major relayout) strategy bench at engine shapes.

v1 current: pad to T=D+step (unaligned minor) -> flat merge -> transpose
v2 aligned-T: pad to 128-multiple T, unaligned view pitch, then transpose
v3 row-scan: scan over k rows, each step dynamic-slices the row at lane
   offset -7k (contiguous DMA at byte offsets) into an aligned ys, then one
   aligned transpose to diagonal-major
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
    batch = int(os.environ.get("SST_B", "16"))
    nB, B, P, step, K = 417, 4096, 12, 7, 32
    nBp = 512
    Dmin = B + (nBp - 1) * step
    D = -(-Dmin // 128) * 128          # 7680
    var = os.environ.get("SST_SKEW", "v3")

    src = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
        k, (batch, P, nB, B), jnp.float32))(jax.random.PRNGKey(0)))
    gb = batch * P * nBp * D * 4 / 1e9

    if var == "v1":
        @jax.jit
        def build(x):
            T = D + step
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, nBp - nB), (0, T - B)))
            flat = xp.reshape(batch, P, nBp * T)
            sk = flat[:, :, :nBp * (T - step)].reshape(batch, P, nBp, D)
            sk = jnp.transpose(sk, (2, 0, 1, 3))   # just consume; engine does (D,P,nBp)
            return jnp.sum(sk)

    elif var == "v1t":
        @jax.jit
        def build(x):
            T = D + step
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, nBp - nB), (0, T - B)))
            flat = xp.reshape(batch, P, nBp * T)
            sk = flat[:, :, :nBp * (T - step)].reshape(batch, P, nBp, D)
            sk = jnp.transpose(sk, (3, 0, 1, 2))   # [D, batch, P, nBp]
            return jnp.sum(sk)

    elif var == "v3":
        @jax.jit
        def build(x):
            Tp = -(-(B + 7 * nBp + 128) // 128) * 128
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, nBp - nB),
                             (7 * nBp, Tp - B - 7 * nBp)))

            def body(c, k):
                row = jax.lax.dynamic_slice(
                    xp, (0, 0, 0, 7 * (nBp - 1) - 7 * k),
                    (batch, P, nBp, 1))  # wrong: need per-k row; do row slice
                return c, None
            # per-row: slice row k at lane offset base - 7k, emit [batch,P,D]
            def body2(c, k):
                r = jax.lax.dynamic_slice(
                    xp, (0, 0, k, 7 * nBp - 7 * k),
                    (batch, P, 1, D))[:, :, 0]
                return c, r

            _, rows = jax.lax.scan(body2, jnp.float32(0),
                                   jnp.arange(nBp, dtype=jnp.int32))
            # rows [nBp, batch, P, D] -> transpose to [D, batch, P, nBp]
            sk = jnp.transpose(rows, (3, 1, 2, 0))
            return jnp.sum(sk)

    dt, cs = timed(build, src)
    print(f"skew {var} b{batch}: {dt*1e3:7.1f} ms (compile {cs:.0f}s; "
          f"{2*gb/dt:.0f} GB/s rw-equiv)", flush=True)


if __name__ == "__main__":
    main()
