#!/usr/bin/env python
"""Skew (xs build) variants + scan-only cost at bench shapes."""
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


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB, B, P = 418, 4096, 12
    step = 7
    K = 32
    nBp = 512
    Dmin = B + (nBp - 1) * step
    align = K * 128 // np.gcd(K, 128)
    D = -(-Dmin // align) * align

    rng = np.random.default_rng(0)
    packed = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, P, nBp, B)).astype(np.float32)))

    def rows_group(G):
        def run(pk):
            def skew_rows(_, g):
                blk = jax.lax.dynamic_slice(pk, (0, 0, g * G, 0),
                                            (batch, P, G, B))
                frames = []
                for r in range(G):
                    frames.append(jax.lax.dynamic_update_slice(
                        jnp.zeros((batch, P, D), pk.dtype),
                        blk[:, :, r], (0, 0, (g * G + r) * step)))
                return _, jnp.stack(frames, 0)

            _, rows = jax.lax.scan(skew_rows, jnp.float32(0),
                                   jnp.arange(nBp // G, dtype=jnp.int32))
            return jnp.sum(rows)
        return run

    def rows_group_t(G):
        """Group variant emitting [G, batch, P, D] then summing transposed."""
        def run(pk):
            def skew_rows(_, g):
                blk = jax.lax.dynamic_slice(pk, (0, 0, g * G, 0),
                                            (batch, P, G, B))
                frames = []
                for r in range(G):
                    frames.append(jax.lax.dynamic_update_slice(
                        jnp.zeros((batch, P, D), pk.dtype),
                        blk[:, :, r], (0, 0, (g * G + r) * step)))
                return _, jnp.stack(frames, 0)

            _, rows = jax.lax.scan(skew_rows, jnp.float32(0),
                                   jnp.arange(nBp // G, dtype=jnp.int32))
            rows = rows.reshape(nBp, batch, P, D)
            sk = jnp.transpose(rows, (3, 2, 1, 0))
            return jnp.sum(sk.reshape(D // K, K, P, batch, nBp))
        return run

    # group-tiled: 4 groups of 128 rows, D_g = B + 127*step
    def rows_tiled(pk):
        GR = 128
        Dg = -(-(B + (GR - 1) * step) // align) * align
        tot = jnp.float32(0)
        for g in range(nBp // GR):
            def skew8(_, j, g=g, Dg=Dg):
                blk = jax.lax.dynamic_slice(pk, (0, 0, g * GR + j * 8, 0),
                                            (batch, P, 8, B))
                frames = []
                for r in range(8):
                    frames.append(jax.lax.dynamic_update_slice(
                        jnp.zeros((batch, P, Dg), pk.dtype),
                        blk[:, :, r], (0, 0, (j * 8 + r) * step)))
                return _, jnp.stack(frames, 0)

            _, rows = jax.lax.scan(skew8, jnp.float32(0),
                                   jnp.arange(GR // 8, dtype=jnp.int32))
            rows = rows.reshape(GR, batch, P, Dg)
            sk = jnp.transpose(rows, (3, 2, 1, 0))
            tot = tot + jnp.sum(sk.reshape(Dg // K, K, P, batch, GR))
        return tot

    tests = [("rows-G8", rows_group(8)), ("rows-G16", rows_group(16)),
             ("rows-G32", rows_group(32)),
             ("rowsT-G8", rows_group_t(8)),
             ("rows-tiled128", rows_tiled)]
    for name, fn in tests:
        dt, cs = timed(jax.jit(fn), packed)
        print(f"{name:14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
