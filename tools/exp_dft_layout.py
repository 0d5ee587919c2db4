#!/usr/bin/env python
"""DFT variants at FULL bench scale (53k frames — exp_dft_precision's 3.3k
frames hid everything under the ~26 ms dispatch):

  precision sweep     highest / high / default at full scale
  stage2 k-leading    emit stage1 as [k1, b, n2]; stage2 as clean batched
                      GEMMs "kbm,kmq->kbq" (contiguous per-k1 operands)
  stacked stage2      one einsum with ar/ai stacked (operand read once)
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


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    cfg = StretchConfig.preset_default(2, 48000)
    basis = stft.StftBasis.for_config(cfg)
    N = basis.fft_samples
    N1, N2, dft1, _, _, _, _, _ = stft._dft_mats(N)
    T1, T2, _, _ = stft._dft_fused_mats(N)
    blk = cfg.block_samples
    pad = -(-blk // N2) * N2 - blk
    M = blk + pad
    n1u = M // N2
    nF = int(os.environ.get("SST_EXP_FRAMES", str(836 * 2 * 32)))

    rng = np.random.default_rng(0)
    y = jax.block_until_ready(jax.device_put(
        rng.standard_normal((nF, M)).astype(np.float32)))

    d1r = jnp.asarray(dft1.real[:, :n1u])
    d1i = jnp.asarray(dft1.imag[:, :n1u])
    t1 = jnp.asarray(T1)
    t2 = jnp.asarray(T2)

    def fwd(yy, prec):
        y3 = yy.reshape(-1, n1u, N2)
        ar = jnp.einsum("kn,bnm->bkm", d1r, y3, precision=prec)
        ai = jnp.einsum("kn,bnm->bkm", d1i, y3, precision=prec)
        xr = (jnp.einsum("bkm,kmq->bqk", ar, t1, precision=prec)
              - jnp.einsum("bkm,kmq->bqk", ai, t2, precision=prec))
        xi = (jnp.einsum("bkm,kmq->bqk", ar, t2, precision=prec)
              + jnp.einsum("bkm,kmq->bqk", ai, t1, precision=prec))
        return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

    for prec in ("highest", "high", "default"):
        dt, cs = timed(jax.jit(lambda v, p=prec: fwd(v, p)), y)
        print(f"prec {prec:8s}: {dt*1e3:7.1f} ms (compile {cs:.0f}s)",
              flush=True)

    hp = "highest"

    def fwd_klead(yy):
        y3 = yy.reshape(-1, n1u, N2)
        ar = jnp.einsum("kn,bnm->kbm", d1r, y3, precision=hp)
        ai = jnp.einsum("kn,bnm->kbm", d1i, y3, precision=hp)
        xr = (jnp.einsum("kbm,kmq->kbq", ar, t1, precision=hp)
              - jnp.einsum("kbm,kmq->kbq", ai, t2, precision=hp))
        xi = (jnp.einsum("kbm,kmq->kbq", ar, t2, precision=hp)
              + jnp.einsum("kbm,kmq->kbq", ai, t1, precision=hp))
        return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

    dt, cs = timed(jax.jit(fwd_klead), y)
    print(f"k-leading     : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)

    # stacked: one [b, 2, k, m] operand, one [2, k, m, q, 2] constant
    Tst = np.zeros((2, N1, N2, N2 // 2, 2), np.float32)
    Tst[0, ..., 0] = T1
    Tst[1, ..., 0] = -T2
    Tst[0, ..., 1] = T2
    Tst[1, ..., 1] = T1
    tst = jnp.asarray(Tst)
    d1s = jnp.stack([d1r, d1i])                       # [2, K1, n1u]

    def fwd_stacked(yy):
        y3 = yy.reshape(-1, n1u, N2)
        a = jnp.einsum("skn,bnm->bskm", d1s, y3, precision=hp)
        x = jnp.einsum("bskm,skmqp->bqkp", a, tst, precision=hp)
        return jnp.sum(jnp.abs(x))

    dt, cs = timed(jax.jit(fwd_stacked), y)
    print(f"stacked       : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)

    # inverse at matching scale, current formulation
    sr = jax.block_until_ready(jax.device_put(
        rng.standard_normal((nF // 2, basis.bands)).astype(np.float32)))
    si = jax.block_until_ready(jax.device_put(
        rng.standard_normal((nF // 2, basis.bands)).astype(np.float32)))

    def inv(a, b):
        return jnp.sum(jnp.abs(stft._matmul_idft(a, b, basis,
                                                 out_len=blk)))

    dt, cs = timed(jax.jit(inv), sr, si)
    print(f"inverse(half) : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
