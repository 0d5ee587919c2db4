#!/usr/bin/env python
"""In-engine sweep breakdown: xs-build vs scan, at the exact vmapped layout
the engine produces.  Materializes plan_spectral's SweepInputs once on device,
then times (a) the pack+skew+transpose xs build alone, (b) the full
_run_sweep, (c) full minus build = scan cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import engine, spectral, stft, wavefront
from signalsmith_stretch_tpu.models import StretchModel
from bench import make_corpus


def timed(fn, *a, reps=3):
    t0 = time.perf_counter()
    float(fn(*a))
    cs = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), cs


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    rate = 48000
    in_len = 480000
    out_len = 600000
    model = StretchModel.build(channels=2, sample_rate=rate,
                               in_samples=in_len, out_samples=out_len)
    plan = model.plan
    consts = plan.consts
    longv = consts.long_vertical_step
    nB = len(plan.arrays["new_spectrum"])
    B = consts.bands
    ch = 2
    pe_from_pi = True

    # synthesize SweepInputs directly on device (values don't matter for perf)
    @jax.jit
    def gen(key):
        c = jax.random.normal(key, (batch, 12, nB, B), jnp.float32)

        def c64(i):
            return jax.lax.complex(c[:, 2 * i], c[:, 2 * i + 1])

        pe = tuple(jnp.abs(c[:, 8 + c_]) for c_ in range(ch))
        pi = tuple(c64(4 + c_) for c_ in range(ch))
        return wavefront.SweepInputs(
            a1=c64(0), a2=c64(1), d1=c64(2), d2=c64(3),
            mc=jnp.zeros((batch, nB, B), jnp.int32), pe=pe, pi=pi)

    inputs = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def build_only(inp):
        step = longv + 1
        K = 32
        nBp = -(-nB // 128) * 128
        Dmin = inp.a1.shape[1] + (nBp - 1) * step
        align = K * 128 // np.gcd(K, 128)
        D = -(-Dmin // align) * align
        arrs = []
        for name in ("a1", "a2", "d1", "d2"):
            z = getattr(inp, name)
            arrs += [z.real, z.imag]
        for c_ in range(ch):
            arrs += [inp.pi[c_].real, inp.pi[c_].imag]
        packed = jnp.stack(arrs, axis=0)
        P = packed.shape[0]
        T = D + step
        xp = jnp.pad(packed, [(0, 0), (0, nBp - nB), (0, T - B)])
        flat = xp.reshape(P, nBp * T)
        sk = flat[:, :nBp * (T - step)].reshape(P, nBp, D)
        sk = jnp.transpose(sk, (2, 0, 1))
        return jnp.sum(sk.reshape(D // K, K, P, nBp))

    f_build = jax.jit(lambda i: jnp.sum(jax.vmap(build_only)(i)))
    dt, cs = timed(f_build, inputs)
    print(f"xs-build : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)

    def full(inp):
        out = wavefront._run_sweep(inp, longv, pe_from_pi=pe_from_pi)
        return jnp.sum(jnp.abs(out))

    f_full = jax.jit(lambda i: jnp.sum(jax.vmap(full)(i)))
    dt2, cs = timed(f_full, inputs)
    print(f"full     : {dt2*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)
    print(f"scan-part: {1e3*(dt2-dt):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
