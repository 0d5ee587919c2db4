#!/usr/bin/env python
"""Component-level timings of interp_planes_window at bench shapes.

Positions are runtime inputs (passed as device arrays), never constants, so
XLA cannot fold the windows.  Shapes default to the stereo48k pitch+12 bench
config at batch 8: nB~360 blocks, B~3073 bins, n=10 planes, geometry (64,128).
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

from signalsmith_stretch_tpu import wavefront

f1 = jnp.float32


def timed(fn, *a, reps=5):
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
    batch = int(os.environ.get("SST_EXP_BATCH", "8"))
    nB, B, n, W0 = 360, 3073, 10, 3073
    C, L = 64, 128
    rng = np.random.default_rng(0)

    # positions: smooth map with slope ~0.9 + small jitter (within capacity)
    base = 0.9 * np.arange(B, dtype=np.float32)
    pos_np = (base[None, None]
              + 8 * rng.standard_normal((batch, nB, 1)).astype(np.float32)
              + 2 * rng.standard_normal((batch, nB, B)).astype(np.float32))
    pos_np = np.clip(pos_np, -10, W0 + 10).astype(np.float32)
    planes_np = rng.standard_normal((batch, nB, n, W0)).astype(np.float32)

    pos = jax.device_put(jnp.asarray(pos_np))
    planes = jax.device_put(jnp.asarray(planes_np))

    def vfull(pl, po):
        out, bad = jax.vmap(
            lambda p, q: wavefront.interp_planes_window(p, q, C, L))(pl, po)
        return jnp.sum(out) + jnp.sum(bad)

    # --- components (mirroring do_slab's internals, batched) -------------
    slab = 8
    nchunk = -(-B // C)
    Bp = nchunk * C
    nslab = -(-nB // slab)
    nBp = nslab * slab

    def prep(pl, po):
        pp = jnp.pad(po, ((0, 0), (0, nBp - nB), (0, Bp - B)), mode="edge")
        plp = jnp.pad(pl, ((0, 0), (0, nBp - nB), (0, 0), (0, 0)))
        low = jnp.floor(pp)
        li = low.astype(jnp.int32)
        frac = (pp - low).astype(jnp.float32)
        li_c = li.reshape(batch, nslab, slab, nchunk, C)
        frac_c = frac.reshape(batch, nslab, slab, nchunk, C)
        pz = jnp.pad(plp.reshape(batch, nslab, slab, n, W0),
                     ((0, 0), (0, 0), (0, 0), (0, 0), (L, L)))
        return li_c, frac_c, pz

    def c_prep(pl, po):
        li_c, frac_c, pz = prep(pl, po)
        return (jnp.sum(li_c) + jnp.sum(frac_c)
                + jnp.sum(pz[..., ::137]))

    def scan_body(fn):
        def run(pl, po):
            li_c, frac_c, pz = prep(pl, po)

            def do_slab(args):
                lic, frc, pzs = args
                return fn(lic, frc, pzs)

            outs = jax.lax.map(
                do_slab,
                (jnp.moveaxis(li_c, 1, 0), jnp.moveaxis(frac_c, 1, 0),
                 jnp.moveaxis(pz, 1, 0)))
            return jnp.sum(outs)
        return run

    def f_win(lic, frc, pzs):
        # lic [batch, slab, nchunk, C]; pzs [batch, slab, n, W0+2L]
        s = jnp.clip(jnp.min(lic, axis=-1) - 1, -L, W0)

        def sl(row, s0):
            return jax.lax.dynamic_slice(row, (0, s0 + L), (n, L))

        win = jax.vmap(jax.vmap(jax.vmap(sl, in_axes=(None, 0)),
                                in_axes=(0, 0)), in_axes=(0, 0))(pzs, s)
        return jnp.sum(win)

    def f_m(lic, frc, pzs):
        s = jnp.clip(jnp.min(lic, axis=-1) - 1, -L, W0)
        rel = lic - s[..., None]
        wio = jnp.arange(L, dtype=jnp.int32)
        vlo = (lic >= 0) & (lic < W0)
        Mlo = jnp.where((rel[..., None] == wio) & vlo[..., None], f1(1), f1(0))
        return jnp.sum(Mlo)

    def f_all(lic, frc, pzs):
        s = jnp.clip(jnp.min(lic, axis=-1) - 1, -L, W0)

        def sl(row, s0):
            return jax.lax.dynamic_slice(row, (0, s0 + L), (n, L))

        win = jax.vmap(jax.vmap(jax.vmap(sl, in_axes=(None, 0)),
                                in_axes=(0, 0)), in_axes=(0, 0))(pzs, s)
        rel = lic - s[..., None]
        wio = jnp.arange(L, dtype=jnp.int32)
        vlo = (lic >= 0) & (lic < W0)
        vhi = (lic + 1 >= 0) & (lic + 1 < W0)
        Mlo = jnp.where((rel[..., None] == wio) & vlo[..., None], f1(1), f1(0))
        Mhi = jnp.where(((rel + 1)[..., None] == wio) & vhi[..., None],
                        f1(1), f1(0))
        M = jnp.concatenate([Mlo, Mhi], axis=-2)
        out = jnp.einsum("bsnw,bsxw->bsnx", win.reshape(batch, slab * nchunk,
                                                        n, L),
                         M.reshape(batch, slab * nchunk, 2 * C, L),
                         precision=jax.lax.Precision.HIGHEST)
        lo = out[..., :C]
        hi = out[..., C:]
        frc2 = frc.reshape(batch, slab * nchunk, 1, C)
        return jnp.sum(lo + (hi - lo) * frc2)

    tests = [("full-op", vfull),
             ("prep", c_prep),
             ("win-only", scan_body(f_win)),
             ("M-only", scan_body(f_m)),
             ("win+M+dot", scan_body(f_all))]
    for name, fn in tests:
        dt, cs = timed(jax.jit(fn), planes, pos)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
