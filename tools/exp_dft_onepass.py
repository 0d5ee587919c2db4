#!/usr/bin/env python
"""Forward-DFT layout shootout at bench shapes: split (4 dots), onepass-A
(interleaved k|s rows + [b,64,256] reshape — pays a tiled relayout),
onepass-B (s-major rows, free [b,2,64,128] view, batch-k dot contracting
(s, m)).  All produce identical values up to reassociation."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import stft
from tputime import timed

PREC = "highest"


def main():
    basis = stft.StftBasis._cached(5760, 1440)
    N = basis.fft_samples
    N1, N2, dft1, _, _, _, _, _ = stft._dft_mats(N)
    T1, T2, _, _ = stft._dft_fused_mats(N)
    K2 = N2 // 2
    nfr = 836 * 32 * 2            # frames x batch x ch at bench shapes
    M = 5760
    n1u = M // N2
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((nfr, n1u, N2)).astype(np.float32))

    d1r = jnp.asarray(dft1.real[:, :n1u].astype(np.float32))
    d1i = jnp.asarray(dft1.imag[:, :n1u].astype(np.float32))
    t1, t2 = jnp.asarray(T1), jnp.asarray(T2)

    @jax.jit
    def split(y):
        ar = jnp.einsum("kn,bnm->bkm", d1r, y, precision=PREC)
        ai = jnp.einsum("kn,bnm->bkm", d1i, y, precision=PREC)
        xr = (jnp.einsum("bkm,kmq->bqk", ar, t1, precision=PREC)
              - jnp.einsum("bkm,kmq->bqk", ai, t2, precision=PREC))
        xi = (jnp.einsum("bkm,kmq->bqk", ar, t2, precision=PREC)
              + jnp.einsum("bkm,kmq->bqk", ai, t1, precision=PREC))
        return jnp.sum(xr) + jnp.sum(xi)

    D1I, W2, _, _ = stft._dft_onepass_mats(N)
    D1Ij = jnp.asarray(D1I[:, :n1u])
    W2j = jnp.asarray(W2)

    @jax.jit
    def onepass_a(y):
        A = jnp.einsum("Kn,bnm->bKm", D1Ij, y, precision=PREC)
        A2 = A.reshape(-1, N1, 2 * N2)
        X = jnp.einsum("bkM,kMQ->bQk", A2, W2j, precision=PREC)
        return jnp.sum(X)

    D1S = np.concatenate([dft1.real[:, :n1u], dft1.imag[:, :n1u]]
                         ).astype(np.float32)          # [s*N1+k, n1]
    W4 = np.empty((2, N1, N2, 2 * K2), np.float32)
    W4[0, :, :, :K2] = T1
    W4[0, :, :, K2:] = T2
    W4[1, :, :, :K2] = -T2
    W4[1, :, :, K2:] = T1
    D1Sj = jnp.asarray(D1S)
    W4j = jnp.asarray(W4)

    @jax.jit
    def onepass_b(y):
        A = jnp.einsum("Kn,bnm->bKm", D1Sj, y, precision=PREC)
        A4 = A.reshape(-1, 2, N1, N2)                  # free view (s major)
        X = jnp.einsum("bskm,skmQ->bQk", A4, W4j, precision=PREC)
        return jnp.sum(X)

    # C: like B but ask for the dot-natural output [b, k, Q] and pay an
    # explicit transpose afterwards (isolates the output-layout cost)
    @jax.jit
    def onepass_c(y):
        A = jnp.einsum("Kn,bnm->bKm", D1Sj, y, precision=PREC)
        A4 = A.reshape(-1, 2, N1, N2)
        X = jnp.einsum("bskm,skmQ->bkQ", A4, W4j, precision=PREC)
        return jnp.sum(X)

    for name, f in [("split", split), ("onepass_a", onepass_a),
                    ("onepass_b", onepass_b), ("onepass_c", onepass_c)]:
        dt, cs = timed(f, y)
        print(f"{name:10s} {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)


def materialized():
    """Same shootout but with the output MATERIALIZED in the engine's
    [.., bands] layout (slice -> reshape -> sum(abs) of both planes), which
    is what the in-engine prefix pays; plus an N1=128/N2=64 factorization
    whose dot output is [b, 32+32, 128] — minor 128, so the bands merge is
    tile-aligned."""
    import numpy as np
    basis = stft.StftBasis._cached(5760, 1440)
    N = basis.fft_samples
    N1, N2, dft1, _, _, _, _, _ = stft._dft_mats(N)
    T1, T2, _, _ = stft._dft_fused_mats(N)
    K2 = N2 // 2
    nfr = 836 * 32 * 2
    M = 5760
    n1u = M // N2
    rng = np.random.default_rng(0)
    yflat = jnp.asarray(rng.standard_normal((nfr, M)).astype(np.float32))

    D1S = np.concatenate([dft1.real[:, :n1u], dft1.imag[:, :n1u]]
                         ).astype(np.float32)
    W4 = np.empty((2, N1, N2, 2 * K2), np.float32)
    W4[0, :, :, :K2] = T1
    W4[0, :, :, K2:] = T2
    W4[1, :, :, :K2] = -T2
    W4[1, :, :, K2:] = T1
    D1Sj, W4j = jnp.asarray(D1S), jnp.asarray(W4)

    @jax.jit
    def b_mat(yf):
        y = yf.reshape(-1, n1u, N2)
        A = jnp.einsum("Kn,bnm->bKm", D1Sj, y, precision=PREC)
        A4 = A.reshape(-1, 2, N1, N2)
        X = jnp.einsum("bskm,skmQ->bQk", A4, W4j, precision=PREC)
        xr = X[:, :K2].reshape(-1, 4096)
        xi = X[:, K2:].reshape(-1, 4096)
        return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

    # N1=128, N2=64 factorization: n = n1*64 + n2, b = k1 + 128*k2
    N1b, N2b = 128, 64
    K2b = N2b // 2
    n1ub = M // N2b                       # 90
    k1 = np.arange(N1b)
    n1 = np.arange(N1b)
    n2 = np.arange(N2b)
    t1c = np.exp(-1j * np.pi * n1 * N2b / N)
    t2c = np.exp(-1j * np.pi * n2 / N)
    dft1b = np.exp(-2j * np.pi * np.outer(k1, n1) / N1b) * t1c
    twb = np.exp(-2j * np.pi * np.outer(k1, n2) / N) * t2c
    dft2b = np.exp(-2j * np.pi * np.outer(n2, np.arange(K2b)) / N2b)
    T1b = (twb.real[:, :, None] * dft2b.real[None]
           - twb.imag[:, :, None] * dft2b.imag[None]).astype(np.float32)
    T2b = (twb.real[:, :, None] * dft2b.imag[None]
           + twb.imag[:, :, None] * dft2b.real[None]).astype(np.float32)
    D1Sb = np.concatenate([dft1b.real[:, :n1ub], dft1b.imag[:, :n1ub]]
                          ).astype(np.float32)        # [s*128+k, n1]
    W4b = np.empty((2, N1b, N2b, 2 * K2b), np.float32)
    W4b[0, :, :, :K2b] = T1b
    W4b[0, :, :, K2b:] = T2b
    W4b[1, :, :, :K2b] = -T2b
    W4b[1, :, :, K2b:] = T1b
    D1Sbj, W4bj = jnp.asarray(D1Sb), jnp.asarray(W4b)

    @jax.jit
    def f64_mat(yf):
        y = yf.reshape(-1, n1ub, N2b)                  # minor 64 view
        A = jnp.einsum("Kn,bnm->bmK", D1Sbj, y, precision=PREC)
        A4 = A.reshape(-1, N2b, 2, N1b)                # free: minor split
        X = jnp.einsum("bmsk,skmQ->bQk", A4, W4bj, precision=PREC)
        xr = X[:, :K2b].reshape(-1, 4096)              # [b, 32, 128] merge
        xi = X[:, K2b:].reshape(-1, 4096)
        return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

    # sanity: both must match jnp.fft on a small slice
    sm = yflat[:4]
    ref = np.fft.fft(np.asarray(sm) * np.exp(-1j*np.pi*np.arange(M)/N),
                     n=N, axis=-1)[:, :4096]
    def check(f, name):
        y = sm
        if f is b_mat:
            A = jnp.einsum("Kn,bnm->bKm", D1Sj, y.reshape(-1, n1u, N2), precision=PREC)
            A4 = A.reshape(-1, 2, N1, N2)
            X = jnp.einsum("bskm,skmQ->bQk", A4, W4j, precision=PREC)
            xr = X[:, :K2].reshape(-1, 4096); xi = X[:, K2:].reshape(-1, 4096)
        else:
            A = jnp.einsum("Kn,bnm->bmK", D1Sbj, y.reshape(-1, n1ub, N2b), precision=PREC)
            A4 = A.reshape(-1, N2b, 2, N1b)
            X = jnp.einsum("bmsk,skmQ->bQk", A4, W4bj, precision=PREC)
            xr = X[:, :K2b].reshape(-1, 4096); xi = X[:, K2b:].reshape(-1, 4096)
        got = np.asarray(xr) + 1j*np.asarray(xi)
        err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"  {name} vs fft: {20*np.log10(err):.0f} dB", flush=True)
    check(b_mat, "b_mat"); check(f64_mat, "f64_mat")

    for name, f in [("b_mat(64x128)", b_mat), ("f64_mat(128x64)", f64_mat)]:
        dt, cs = timed(f, yflat)
        print(f"{name:16s} {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    if os.environ.get("SST_EXP_MAT") == "1":
        materialized()
    else:
        main()
