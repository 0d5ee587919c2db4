#!/usr/bin/env python
"""Sub-stage timing of the matmul DFT (analyze path) on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import functools
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import stft
from signalsmith_stretch_tpu.config import StretchConfig


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB, ch = 418, 2
    cfg = StretchConfig.preset_default(ch, 48000, False)
    basis = stft.StftBasis.for_config(cfg)
    N = basis.fft_samples
    N1, N2, dft1, tw, dft2, _, _, _ = stft._dft_mats(N)
    nfr = batch * nB * ch

    frames = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
        k, (nfr, cfg.block_samples), jnp.float32))(jax.random.PRNGKey(0)))

    window = jnp.asarray(basis.window)

    def wpad(fr):
        y = fr * window
        return jnp.pad(y, ((0, 0), (0, N - cfg.block_samples)))

    @jax.jit
    def f_wpad(fr):
        return jnp.sum(wpad(fr))

    @jax.jit
    def f_s1(fr):
        y = wpad(fr).reshape(-1, N1, N2)
        dot = functools.partial(jnp.einsum, "kn,bnm->bkm",
                                precision="highest")
        ar = dot(jnp.asarray(dft1.real), y)
        ai = dot(jnp.asarray(dft1.imag), y)
        return jnp.sum(ar) + jnp.sum(ai)

    @jax.jit
    def f_s1mm(fr):
        y = wpad(fr).reshape(-1, N1, N2)
        d1r = jnp.asarray(dft1.real)
        d1i = jnp.asarray(dft1.imag)
        ar = jnp.matmul(d1r, y, precision="highest")
        ai = jnp.matmul(d1i, y, precision="highest")
        return jnp.sum(ar) + jnp.sum(ai)

    @jax.jit
    def f_full(fr):
        xr, xi = stft._matmul_dft(wpad(fr), basis)
        return jnp.sum(xr) + jnp.sum(xi)

    for name, f in [("window+pad", f_wpad), ("stage1 einsum", f_s1),
                    ("stage1 matmul", f_s1mm), ("full dft", f_full)]:
        dt, cs = timed(f, frames)
        print(f"{name:14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
