#!/usr/bin/env python
"""Microbenchmark of the wavefront diagonal sweep in isolation.

Generates synthetic SweepInputs ON DEVICE (host->device through the relay is
~30 MB/s; never ship gigabytes), then times three granularities at the
headline-bench shape (default preset, 48 kHz, 10 s, batch 32):

  xs-build   pack + skew + transpose + reshape, checksummed
  scan-only  the lax.scan over a prebuilt xs array
  full       wavefront._run_sweep as the engine calls it

SST_SWEEP_* env vars override the shape; SST_SWEEP_UNROLL overrides K.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import wavefront
from signalsmith_stretch_tpu.wavefront import SweepInputs


def timed(fn, *a, reps=3):
    t0 = time.perf_counter()
    float(fn(*a))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


def main():
    batch = int(os.environ.get("SST_SWEEP_BATCH", "32"))
    nB = int(os.environ.get("SST_SWEEP_NB", "417"))
    B = int(os.environ.get("SST_SWEEP_BANDS", "4096"))
    ch = int(os.environ.get("SST_SWEEP_CH", "2"))
    longv = int(os.environ.get("SST_SWEEP_LONGV", "6"))
    K = int(os.environ.get("SST_SWEEP_UNROLL", "32"))
    step = longv + 1
    D0 = B + (nB - 1) * step
    D = -(-D0 // K) * K
    P = 8 + (1 if ch > 2 else 0) + 3 * ch

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 2)
        c = jax.random.normal(ks[0], (batch, 7 * ch + 8, nB, B), jnp.float32)

        def c64(i):
            return jax.lax.complex(c[:, 2 * i], c[:, 2 * i + 1])

        mc = (jax.random.uniform(ks[1], (batch, nB, B)) * ch).astype(jnp.int32)
        pe = tuple(jnp.abs(c[:, 8 + 2 * ch + i]) for i in range(ch))
        pi = tuple(c64(4 + ch + i) for i in range(ch))
        return SweepInputs(a1=c64(0), a2=c64(1), d1=c64(2), d2=c64(3),
                           mc=mc, pe=pe, pi=pi)

    inputs = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    # --- full ---------------------------------------------------------------
    def run_one(inp):
        out = wavefront._run_sweep(inp, longv, unroll=K)
        return jnp.sum(jnp.abs(out))

    f_full = jax.jit(lambda i: jnp.sum(jax.vmap(run_one)(i)))
    dt, cs = timed(f_full, inputs)
    print(f"full      K={K}: {dt*1e3:7.1f} ms (compile {cs:.0f}s, "
          f"{dt/D0*1e6:.2f} us/diag)", flush=True)

    # --- xs build only ------------------------------------------------------
    def xs_one(inp):
        arrs = []
        for name in ("a1", "a2", "d1", "d2"):
            z = getattr(inp, name)
            arrs += [z.real, z.imag]
        if ch > 2:
            arrs.append(inp.mc.astype(jnp.float32))
        for c in range(ch):
            arrs.append(inp.pe[c])
        for c in range(ch):
            arrs += [inp.pi[c].real, inp.pi[c].imag]
        packed = jnp.stack(arrs, axis=0)
        T = D + step
        xp = jnp.pad(packed, [(0, 0), (0, 0), (0, T - B)])
        flat = xp.reshape(P, nB * T)
        sk = flat[:, :nB * (T - step)].reshape(P, nB, D)
        sk = jnp.transpose(sk, (2, 0, 1))
        return jnp.sum(sk.reshape(D // K, K, P, nB))

    f_xs = jax.jit(lambda i: jnp.sum(jax.vmap(xs_one)(i)))
    dt, cs = timed(f_xs, inputs)
    gb = batch * D * P * nB * 4 / 1e9
    print(f"xs-build  : {dt*1e3:7.1f} ms (compile {cs:.0f}s; xs {gb:.2f} GB "
          f"-> {2*gb/dt:.0f} GB/s rw)", flush=True)

    # --- scan over prebuilt xs ---------------------------------------------
    xs_dev = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (batch, D // K, K, P, nB), jnp.float32)
    )(jax.random.PRNGKey(1)))

    def scan_one(sk):
        # replicate _run_sweep's scan with the same unpack/cell/body
        ring0 = jnp.zeros((longv, ch, nB), jnp.complex64)
        body = _make_body()
        _, outs = jax.lax.scan(body, ring0, sk)
        return jnp.sum(jnp.abs(outs))

    def _make_body():
        carry_mc = ch > 2

        def unpack(row):
            C = jax.lax.complex
            i = [0]

            def take():
                v = row[:, i[0]]
                i[0] += 1
                return v

            a1 = C(take(), take())
            a2 = C(take(), take())
            d1 = C(take(), take())
            d2 = C(take(), take())
            mc = take().astype(jnp.int32) if carry_mc else None
            pe = tuple(take() for _ in range(ch))
            pi = tuple(C(take(), take()) for _ in range(ch))
            if not carry_mc:
                mc = (jnp.zeros(pe[0].shape, jnp.int32) if ch == 1
                      else (pe[1] > pe[0]).astype(jnp.int32))
            return SweepInputs(a1=a1, a2=a2, d1=d1, d2=d2, mc=mc, pe=pe, pi=pi)

        def shift_k(x):
            return jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]], -1)

        def cell(ring_list, x, j):
            mc = x.mc[j]
            prev1 = [ring_list[-1][c] for c in range(ch)]
            prevl = [ring_list[0][c] for c in range(ch)]
            down1 = wavefront._sel(mc, prev1)
            downl = wavefront._sel(mc, prevl)
            up1 = wavefront._sel(mc, [shift_k(p) for p in prevl])
            upl = wavefront._sel(mc, [shift_k(p) for p in prev1])
            phase = (x.d1[j] * down1 + x.d2[j] * downl
                     + x.a1[j] * up1 + x.a2[j] * upl)
            pe_max = wavefront._sel(mc, [x.pe[c][j] for c in range(ch)])
            pi_max = wavefront._sel(mc, [x.pi[c][j] for c in range(ch)])
            out_main = wavefront._make_output(pe_max, pi_max, phase)
            outs = []
            for c in range(ch):
                ct = x.pi[c][j] * jnp.conj(pi_max)
                locked = wavefront._make_output(x.pe[c][j], x.pi[c][j],
                                                out_main * ct)
                outs.append(jnp.where(mc == c, out_main, locked))
            return outs

        def body(ring, row):
            x = unpack(row)
            ring_list = [[ring[l, c] for c in range(ch)] for l in range(longv)]
            emitted = []
            for j in range(K):
                outs = cell(ring_list, x, j)
                ring_list = ring_list[1:] + [outs]
                emitted.append(jnp.stack(outs, axis=0))
            ring2 = jnp.stack([jnp.stack(r, 0) for r in ring_list], 0)
            return ring2, jnp.stack(emitted, axis=0)

        return body

    f_scan = jax.jit(lambda x: jnp.sum(jax.vmap(scan_one)(x)))
    dt, cs = timed(f_scan, xs_dev)
    print(f"scan-only : {dt*1e3:7.1f} ms (compile {cs:.0f}s, "
          f"{dt/D*1e6:.2f} us/diag)", flush=True)


if __name__ == "__main__":
    main()
