#!/usr/bin/env python
"""DFT formulation shootout at bench shapes (53.5k frames of block 5760).

Variants:
  A  current two-stage (separate re/im einsums, HIGHEST)
  B  two-stage, stage-1 re/im stacked into one einsum; stage-2 as one
     [2K1, N2] x [N2, 2K2] einsum + 4 small adds
  C  single-stage: one [2*bands, M] f32 matrix at HIGH (3-pass)
  D  single-stage at HIGHEST (6-pass)
Accuracy is reported vs a float64 DFT on a small probe batch.
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
    N = basis.fft_samples
    M = y.shape[-1]
    n = np.arange(M)
    b = np.arange(basis.bands)
    W = np.exp(-2j * np.pi * np.outer(b + 0.5, n) / N)
    return y.astype(np.float64) @ W.T


def db(a, r):
    return 10 * np.log10(np.mean(np.abs(a - r) ** 2)
                         / (np.mean(np.abs(r) ** 2) + 1e-300) + 1e-300)


def timed(fn, x, reps=3):
    t0 = time.perf_counter()
    float(fn(x))
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts), cs


def main():
    cfg = StretchConfig.preset_default(2, 48000)
    basis = stft.StftBasis.for_config(cfg)
    N = basis.fft_samples
    N1, N2, dft1, tw, dft2, _, _, _ = stft._dft_mats(N)
    K1, K2 = N1, N2 // 2
    blk = cfg.block_samples
    pad = -(-blk // N2) * N2 - blk
    M = blk + pad
    n1u = M // N2

    rng = np.random.default_rng(0)
    nF = int(os.environ.get("SST_EXP_FRAMES", str(836 * 32 * 2)))
    big = jnp.asarray(rng.standard_normal((nF, M)).astype(np.float32))
    probe_np = rng.standard_normal((64, M)).astype(np.float32)
    probe = jnp.asarray(probe_np)
    ref = ref_dft(probe_np, basis)

    # ---- A: current ------------------------------------------------------
    @jax.jit
    def A(y):
        xr, xi = stft._matmul_dft(y, basis)
        return xr, xi

    # ---- B: stacked two-stage -------------------------------------------
    d1s = jnp.asarray(np.concatenate([dft1.real[:, :n1u],
                                      dft1.imag[:, :n1u]], 0)
                      .astype(np.float32))              # [2K1, n1u]
    twr = jnp.asarray(tw.real)
    twi = jnp.asarray(tw.imag)
    d2s = jnp.asarray(np.concatenate([dft2.real, dft2.imag], 1)
                      .astype(np.float32))              # [N2, 2K2]

    @jax.jit
    def B(y):
        y3 = y.reshape(-1, n1u, N2)
        a = jnp.einsum("kn,bnm->bkm", d1s, y3, precision="highest")
        ar, ai = a[:, :K1], a[:, K1:]
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        bs = jnp.concatenate([br, bi], 1)               # [b, 2K1, N2]
        p = jnp.einsum("bkm,mq->bkq", bs, d2s, precision="highest")
        # p[b, k1|k1', q = q_r|q_i]
        rr, ri = p[:, :K1, :K2], p[:, :K1, K2:]
        ir, ii = p[:, K1:, :K2], p[:, K1:, K2:]
        xr = jnp.transpose(rr - ii, (0, 2, 1)).reshape(y.shape[0], -1)
        xi = jnp.transpose(ri + ir, (0, 2, 1)).reshape(y.shape[0], -1)
        return xr, xi

    # ---- C/D: single stage ----------------------------------------------
    n = np.arange(M)
    b = np.arange(basis.bands)
    W = np.exp(-2j * np.pi * np.outer(b + 0.5, n) / N)
    Ws = jnp.asarray(np.concatenate([W.real, W.imag], 0).astype(np.float32))

    def single(prec):
        @jax.jit
        def f(y):
            out = jnp.einsum("kn,bn->bk", Ws, y, precision=prec)
            return out[:, :basis.bands], out[:, basis.bands:]
        return f

    C = single("high")
    D = single("highest")

    for name, f in [("A 2stage-cur", A), ("B 2stage-stk", B),
                    ("C 1stage-hi", C), ("D 1stage-hst", D)]:
        xr, xi = f(probe)
        acc = db(np.asarray(xr) + 1j * np.asarray(xi), ref)

        g = jax.jit(lambda y, f=f: sum(jnp.sum(jnp.abs(v)) for v in f(y)))
        dt, cs = timed(g, big)
        print(f"{name:14s} acc {acc:8.1f} dB   {dt*1e3:7.1f} ms "
              f"(compile {cs:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
