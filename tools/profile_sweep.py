#!/usr/bin/env python
"""In-engine sweep breakdown at the explicit batched layout: xs build
(pack+skew+transpose) vs the scan vs the whole sweep+unskew."""
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
    step = longv + 1
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
    nBp = -(-nB // 128) * 128
    Dmin = B + (nBp - 1) * step
    align = K * 128 // np.gcd(K, 128)
    D = -(-Dmin // align) * align
    P = 12

    def pack(inp):
        arrs = []
        for name in ("a1", "a2", "d1", "d2"):
            z = getattr(inp, name)
            arrs += [z.real, z.imag]
        for c in range(ch):
            arrs += [inp.pi[c].real, inp.pi[c].imag]
        return jnp.stack(arrs, axis=1)             # [batch, P, nB, B]

    def rows_of(packed):
        def skew_row(_, k):
            kc = jnp.minimum(k, nB - 1)
            row = jax.lax.dynamic_slice(packed, (0, 0, kc, 0),
                                        (batch, P, 1, B))
            row = jnp.where(k < nB, row, jnp.zeros((), packed.dtype))
            frame = jax.lax.dynamic_update_slice(
                jnp.zeros((batch, P, 1, D), packed.dtype), row,
                (0, 0, 0, kc * step))
            return _, frame[:, :, 0]

        _, rows = jax.lax.scan(skew_row, jnp.float32(0),
                               jnp.arange(nBp, dtype=jnp.int32))
        return rows                                 # [nBp, batch, P, D]

    @jax.jit
    def f_rows(inp):
        return jnp.sum(rows_of(pack(inp)))

    @jax.jit
    def f_build(inp):
        rows = rows_of(pack(inp))
        sk = jnp.transpose(rows, (3, 2, 1, 0))
        return jnp.sum(sk.reshape(D // K, K, P, batch, nBp))

    fn = wavefront._sweep_unskew_fn(longv, ch, True, B, K)

    @jax.jit
    def f_full(inp):
        res = jax.vmap(fn)(inp)        # rule -> one batched program
        return jnp.sum(jnp.abs(res))

    dt, cs = timed(f_rows, inputs)
    print(f"rows(skew) : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)
    dt, cs = timed(f_build, inputs)
    print(f"build(+T)  : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)
    dt, cs = timed(f_full, inputs)
    print(f"sweep full : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
