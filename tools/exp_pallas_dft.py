#!/usr/bin/env python
"""Fused Pallas forward-DFT prototype at bench shapes.

The XLA two-stage matmul DFT materializes the [.., K1, N2] stage-1 planes in
HBM (ar/ai: 1.75 GB write + read at bench scale) and runs ~46-57 ms for 53k
frames regardless of MXU precision (tools/exp_dft_layout: it is
layout/traffic-bound, not pass-bound).  This kernel keeps stage 1 + twiddle
+ stage 2 in VMEM per frame tile: HBM traffic drops to read-y + write-X
(~2.1 GB), the window multiply rides along free, and the MXU runs both
stages back-to-back.

Output layout is [F, K1, K2] (k1-major tiles, static-index stores); the
natural band order b = k1 + N1*k2 needs one XLA [64,64]-transpose after
(timed here as part of the fused path).
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
from jax.experimental.pallas import tpu as pltpu

from signalsmith_stretch_tpu import stft
from signalsmith_stretch_tpu.config import StretchConfig


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def build_consts(basis):
    N = basis.fft_samples
    N1, N2, dft1, _, _, _, _, _ = stft._dft_mats(N)
    T1, T2, _, _ = stft._dft_fused_mats(N)
    M = -(-basis.block_samples // N2) * N2
    n1u = M // N2
    return N1, N2, n1u, M, dft1, T1, T2


def pallas_fwd(basis, TB, prec):
    N1, N2, n1u, M, dft1, T1, T2 = build_consts(basis)
    K2 = N2 // 2
    d1r = jnp.asarray(np.ascontiguousarray(dft1.real[:, :n1u]), jnp.float32)
    d1i = jnp.asarray(np.ascontiguousarray(dft1.imag[:, :n1u]), jnp.float32)
    t1 = jnp.asarray(T1)      # [N1, N2, K2]
    t2 = jnp.asarray(T2)

    def kernel(y_ref, d1r_ref, d1i_ref, t1_ref, t2_ref, xr_ref, xi_ref):
        y = y_ref[...].reshape(TB, n1u, N2)
        yt = jnp.transpose(y, (1, 0, 2)).reshape(n1u, TB * N2)
        dn = (((1,), (0,)), ((), ()))
        ar = jax.lax.dot_general(d1r_ref[...], yt, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=prec).reshape(N1, TB, N2)
        ai = jax.lax.dot_general(d1i_ref[...], yt, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=prec).reshape(N1, TB, N2)
        for k in range(N1):
            a_k = ar[k]                       # [TB, N2]
            b_k = ai[k]
            t1k = t1_ref[k]                   # [N2, K2]
            t2k = t2_ref[k]
            dot = functools.partial(jax.lax.dot_general,
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            xr_ref[:, k, :] = dot(a_k, t1k) - dot(b_k, t2k)
            xi_ref[:, k, :] = dot(a_k, t2k) + dot(b_k, t1k)

    def fwd(y):   # y [F, M] windowed frames
        F = y.shape[0]
        xr, xi = pl.pallas_call(
            kernel,
            grid=(F // TB,),
            in_specs=[
                pl.BlockSpec((TB, M), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N1, n1u), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N1, n1u), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N1, N2, K2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N1, N2, K2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TB, N1, K2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, N1, K2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((F, N1, K2), jnp.float32),
                       jax.ShapeDtypeStruct((F, N1, K2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(y, d1r, d1i, t1, t2)
        # natural band order b = k1 + N1*k2
        xr = jnp.transpose(xr, (0, 2, 1)).reshape(F, N1 * K2)
        xi = jnp.transpose(xi, (0, 2, 1)).reshape(F, N1 * K2)
        return xr, xi

    return fwd


def main():
    cfg = StretchConfig.preset_default(2, 48000)
    basis = stft.StftBasis.for_config(cfg)
    N1, N2, n1u, M, _, _, _ = build_consts(basis)
    nF = int(os.environ.get("SST_EXP_FRAMES", str(836 * 2 * 32)))
    TB = int(os.environ.get("SST_PALLAS_TB", "128"))
    prec = os.environ.get("SST_DFT_PRECISION", "highest")
    print(f"frames={nF} M={M} n1u={n1u} N1={N1} N2={N2} TB={TB} prec={prec}",
          flush=True)

    rng = np.random.default_rng(0)
    y = jax.block_until_ready(jax.device_put(
        rng.standard_normal((nF, M)).astype(np.float32)))

    f_ref = jax.jit(lambda v: stft._matmul_dft(v, basis))
    fwd = pallas_fwd(basis, TB, prec)
    f_pal = jax.jit(fwd)

    dt, cs = timed(lambda v: sum(jnp.sum(jnp.abs(o)) for o in f_ref(v)), y)
    print(f"xla fwd    : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)
    dt, cs = timed(lambda v: sum(jnp.sum(jnp.abs(o)) for o in f_pal(v)), y)
    print(f"pallas fwd : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)

    ar, ai = [np.asarray(v) for v in f_ref(y[:1024])]
    br, bi = [np.asarray(v) for v in f_pal(y[:1024])]
    ref = ar + 1j * ai
    err = (br - ar) + 1j * (bi - ai)
    db = 10 * np.log10(np.mean(np.abs(err) ** 2)
                       / np.mean(np.abs(ref) ** 2) + 1e-300)
    print(f"pallas vs xla: {db:.1f} dB  "
          f"bitexact={np.array_equal(ar, br) and np.array_equal(ai, bi)}",
          flush=True)


if __name__ == "__main__":
    main()
