#!/usr/bin/env python
"""Incremental-prefix timing of the two-stage matmul DFT at bench shapes:
which pass carries the excess over the ~18 ms traffic floor?

Prefixes: stage1 (2 einsums) -> +twiddle -> +stage2 (4 einsums) -> +reshape.
Also: stage2 emitted at [b, k, q] vs [b, q, k], and a fused variant folding
the twiddle into per-k1 batched stage-2 matrices (no br/bi materialization).
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

    d1r = jnp.asarray(dft1.real[:, :n1u])
    d1i = jnp.asarray(dft1.imag[:, :n1u])
    twr, twi = jnp.asarray(tw.real), jnp.asarray(tw.imag)
    d2r, d2i = jnp.asarray(dft2.real), jnp.asarray(dft2.imag)
    hp = "highest"

    def s1(y):
        y3 = y.reshape(-1, n1u, N2)
        ar = jnp.einsum("kn,bnm->bkm", d1r, y3, precision=hp)
        ai = jnp.einsum("kn,bnm->bkm", d1i, y3, precision=hp)
        return ar, ai

    def s2(y):
        ar, ai = s1(y)
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        return br, bi

    def s3(y):
        br, bi = s2(y)
        xr = (jnp.einsum("mq,bkm->bqk", d2r, br, precision=hp)
              - jnp.einsum("mq,bkm->bqk", d2i, bi, precision=hp))
        xi = (jnp.einsum("mq,bkm->bqk", d2i, br, precision=hp)
              + jnp.einsum("mq,bkm->bqk", d2r, bi, precision=hp))
        return xr, xi

    def s4(y):
        xr, xi = s3(y)
        return xr.reshape(y.shape[0], -1), xi.reshape(y.shape[0], -1)

    # stage-2 emitting [b, k, q] instead (merge needs a transpose after)
    def s3kq(y):
        br, bi = s2(y)
        xr = (jnp.einsum("mq,bkm->bkq", d2r, br, precision=hp)
              - jnp.einsum("mq,bkm->bkq", d2i, bi, precision=hp))
        xi = (jnp.einsum("mq,bkm->bkq", d2i, br, precision=hp)
              + jnp.einsum("mq,bkm->bkq", d2r, bi, precision=hp))
        return xr, xi

    # twiddle folded into batched per-k1 stage-2 matrices
    T1 = jnp.asarray((tw.real[:, :, None] * dft2.real[None]
                      - tw.imag[:, :, None] * dft2.imag[None])
                     .astype(np.float32))          # [K1, N2, K2]
    T2 = jnp.asarray((tw.real[:, :, None] * dft2.imag[None]
                      + tw.imag[:, :, None] * dft2.real[None])
                     .astype(np.float32))

    def fused(y):
        ar, ai = s1(y)
        xr = (jnp.einsum("bkm,kmq->bqk", ar, T1, precision=hp)
              - jnp.einsum("bkm,kmq->bqk", ai, T2, precision=hp))
        xi = (jnp.einsum("bkm,kmq->bqk", ar, T2, precision=hp)
              + jnp.einsum("bkm,kmq->bqk", ai, T1, precision=hp))
        return xr.reshape(y.shape[0], -1), xi.reshape(y.shape[0], -1)

    for name, f in [("stage1", s1), ("+twiddle", s2), ("+stage2[bqk]", s3),
                    ("+reshape", s4), ("stage2[bkq]", s3kq),
                    ("fused-tw", fused)]:
        g = jax.jit(lambda y, f=f: sum(jnp.sum(jnp.abs(v)) for v in f(y)))
        dt, cs = timed(g, big)
        print(f"{name:14s} {dt*1e3:7.1f} ms  (compile {cs:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
