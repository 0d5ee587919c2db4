#!/usr/bin/env python
"""Accuracy + speed of the matmul DFT at HIGH (bf16x3) vs HIGHEST (bf16x6).

The DFT einsums currently run at Precision.HIGHEST.  bf16x3 halves the MXU
passes; this measures (a) forward/inverse accuracy vs a float64 numpy DFT,
(b) round-trip identity error, (c) wall time at bench shapes, to decide
whether the analysis/synthesis FFTs can drop to HIGH within the -60 dB
parity budget (the identity gate sits at -124 dB today).
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

from signalsmith_stretch_tpu import stft
from signalsmith_stretch_tpu.config import StretchConfig


def ref_dft(y, basis):
    """float64 modified DFT of real frames y [..., M] -> [..., bands]."""
    N = basis.fft_samples
    M = y.shape[-1]
    n = np.arange(M)
    b = np.arange(basis.bands)
    W = np.exp(-2j * np.pi * np.outer(b + 0.5, n) / N)   # [bands, M]
    return y.astype(np.float64) @ W.T


def db(a, r):
    return 10 * np.log10(np.mean(np.abs(a - r) ** 2)
                         / (np.mean(np.abs(r) ** 2) + 1e-300) + 1e-300)


def main():
    cfg = StretchConfig.preset_default(2, 48000)
    basis = stft.StftBasis.for_config(cfg)
    rng = np.random.default_rng(0)
    nF = 256
    frames = rng.standard_normal((nF, cfg.block_samples)).astype(np.float32)

    N2 = stft._dft_mats(basis.fft_samples)[1]
    pad = -(-cfg.block_samples // N2) * N2 - cfg.block_samples
    y = np.pad(frames, ((0, 0), (0, pad))).astype(np.float32)
    ref = ref_dft(y, basis)

    for prec in ("highest", "high", "default"):
        os.environ["SST_DFT_PRECISION"] = prec

        @jax.jit
        def fwd(yy):
            xr, xi = stft._matmul_dft(yy, basis)
            return xr, xi

        @jax.jit
        def rt(yy):
            xr, xi = stft._matmul_dft(yy, basis)
            out = stft._matmul_idft(xr, xi, basis,
                                    out_len=basis.block_samples)
            return out

        xr, xi = fwd(jnp.asarray(y))
        got = np.asarray(xr) + 1j * np.asarray(xi)
        acc = db(got, ref)
        # round-trip: y -> spectrum -> y (modified transform is invertible
        # up to the conjugate-mirror half: identity holds for the real part)
        back = np.asarray(rt(jnp.asarray(y)))[:, :cfg.block_samples]
        rt_err = db(back, y[:, :cfg.block_samples].astype(np.float64))

        # timing at the real bench batch (53504 frames, floor-corrected)
        nBig = int(os.environ.get("SST_DFT_FRAMES", "53504"))
        big = jax.block_until_ready(jax.jit(lambda k: jax.random.normal(
            k, (nBig, cfg.block_samples + pad), jnp.float32))(
                jax.random.PRNGKey(0)))

        @jax.jit
        def tfwd(yy):
            xr, xi = stft._matmul_dft(yy, basis)
            return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

        @jax.jit
        def tinv(yy):
            xr, xi = stft._matmul_dft(yy, basis)
            out = stft._matmul_idft(xr, xi, basis,
                                    out_len=basis.block_samples)
            return jnp.sum(jnp.abs(out))

        from tputime import timed
        dt, _ = timed(tfwd, big)
        dti, _ = timed(tinv, big)
        print(f"{prec:8s}  fwd_acc {acc:8.1f} dB   roundtrip {rt_err:8.1f} dB"
              f"   fwd {dt*1e3:7.1f} ms   fwd+inv {dti*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
