#!/usr/bin/env python
"""Isolated costs of the mapped output-map builder's pieces at bench shapes.

p:map measured 905 ms (tools/profile_mapped.py, batch 32); this attributes
it: bin smoothing (4 associative IIR scans), the windowed segment sum
(_segment_sum_runs), and the fused rank+taps window (_rank_taps_window) —
each vmapped over batch on realistic run structure (random energy vs its
smoothing, ~B/6 runs per block).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import wavefront
from signalsmith_stretch_tpu.ops import scan_ops
from tputime import timed

f32 = np.float32


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "334"))
    B = int(os.environ.get("SST_BANDS", "4096"))
    nseg = B // 2 + 2
    slew = f32(0.149)

    @jax.jit
    def gen(key):
        e = jax.random.uniform(key, (batch, nB, B), jnp.float32) ** 4
        sm = e
        ee = jnp.zeros((batch, nB), jnp.float32)
        for _ in range(2):
            sm, ee = scan_ops.iir_backward(sm, ee, slew)
            sm, ee = scan_ops.iir_forward(sm, ee, slew)
        return e, sm

    energy, smoothed = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    above_np = np.asarray(energy > smoothed)
    print("mean runs/block:",
          (np.diff(above_np.astype(np.int8), axis=-1) == 1).sum(-1).mean(),
          flush=True)

    def smooth(e):
        def one(en):
            sm = en
            ee = jnp.zeros(en.shape[:-1], jnp.float32)
            for _ in range(2):
                sm, ee = scan_ops.iir_backward(sm, ee, slew)
                sm, ee = scan_ops.iir_forward(sm, ee, slew)
            return jnp.sum(sm)
        return jnp.sum(jax.vmap(one)(e))

    def run_structure(en, sm):
        above = en > sm
        start = above & jnp.concatenate(
            [jnp.ones(above.shape[:-1] + (1,), bool), ~above[..., :-1]], -1)
        run_id = jnp.cumsum(start.astype(jnp.int32), -1) - 1
        return above, run_id

    def segsum(e, s):
        def one(en, sm):
            above, run_id = run_structure(en, sm)
            b_idx = jnp.arange(B, dtype=jnp.float32)
            sums = wavefront._segment_sum_runs(
                jnp.stack([b_idx[None] * en, en], axis=1),
                run_id, above, nseg)
            return jnp.sum(sums)
        return jnp.sum(jax.vmap(one)(e, s))

    def ranktaps(e, s):
        C, L = wavefront._rank_geometry(4.0)

        def one(en, sm):
            above, run_id = run_structure(en, sm)
            # synthetic monotone cells/tables with the right population
            nb = en.shape[0]
            n_peaks = jnp.sum((above & jnp.concatenate(
                [jnp.ones((nb, 1), bool), ~above[:, :-1]], 1))
                .astype(jnp.int32), 1)
            j = jnp.arange(nseg, dtype=jnp.float32)[None]
            frac = j / jnp.maximum(n_peaks[:, None].astype(jnp.float32), 1)
            cells = jnp.where(j < n_peaks[:, None],
                              (frac * (B - 2)).astype(jnp.int32) + 1,
                              jnp.int32(B))
            tables = jnp.stack([cells.astype(jnp.float32),
                                cells.astype(jnp.float32) * 0.5], 1)
            k, lo, hi, bad = wavefront._rank_taps_window(
                cells, tables, B, C, L)
            return jnp.sum(k) + jnp.sum(lo) + jnp.sum(hi) + bad
        return jnp.sum(jax.vmap(one)(e, s))

    def segscan(e, s):
        """Segmented run sums in bin space: fwd segmented-add + bwd
        propagate-total, 2 data planes — the scan side of a scatter+scan
        reformulation of the map builder."""
        def one(en, sm):
            above, _ = run_structure(en, sm)
            start = above & jnp.concatenate(
                [jnp.ones((en.shape[0], 1), bool), ~above[:, :-1]], -1)
            b_idx = jnp.arange(B, dtype=jnp.float32)
            data = jnp.stack([b_idx[None] * en, en], 0)   # [2, nB, B]
            flag = jnp.broadcast_to(start[None], data.shape)

            def comb(l, r):
                return (jnp.where(r[1], r[0], l[0] + r[0]), l[1] | r[1])

            ps, _ = jax.lax.associative_scan(
                comb, (data * above[None], flag), axis=-1)
            # propagate run totals backward: reverse copy-with-reset
            rev = ps[..., ::-1]
            rflag = flag[..., ::-1]

            def comb2(l, r):
                return (jnp.where(r[1], r[0], l[0]), l[1] | r[1])

            tot, _ = jax.lax.associative_scan(
                comb2, (rev, jnp.concatenate(
                    [rflag[..., -1:], rflag[..., :-1]], -1)), axis=-1)
            return jnp.sum(tot)
        return jnp.sum(jax.vmap(one)(e, s))

    def scatterfill(e, s):
        """4 scatter-max/min [nB, B] at start bins + 2 cummax/cummin fills:
        the scatter side of the reformulation."""
        def one(en, sm):
            above, _ = run_structure(en, sm)
            nb = en.shape[0]
            start = above & jnp.concatenate(
                [jnp.ones((nb, 1), bool), ~above[:, :-1]], -1)
            b_idx = jnp.arange(B, dtype=jnp.float32)
            fake_out = b_idx[None] * f32(0.79)            # monotone map
            idx = jnp.where(start,
                            jnp.clip(jnp.ceil(fake_out), 0, B)
                            .astype(jnp.int32), B)
            lo0 = jnp.full((nb, B + 1), -jnp.inf, jnp.float32)
            hi0 = jnp.full((nb, B + 1), jnp.inf, jnp.float32)
            v1 = jnp.where(start, fake_out, -jnp.inf)
            v2 = jnp.where(start, en, -jnp.inf)
            lo1 = jax.vmap(lambda z, i, v: z.at[i].max(v))(lo0, idx, v1)
            lo2 = jax.vmap(lambda z, i, v: z.at[i].max(v))(lo0, idx, v2)
            hi1 = jax.vmap(lambda z, i, v: z.at[i].min(v))(hi0, idx, -v1)
            hi2 = jax.vmap(lambda z, i, v: z.at[i].min(v))(hi0, idx, -v2)
            fill_lo = jax.lax.associative_scan(
                jnp.maximum, jnp.stack([lo1, lo2]), axis=-1)
            fill_hi = jax.lax.associative_scan(
                jnp.minimum, jnp.stack([hi1, hi2])[..., ::-1], axis=-1)
            return (jnp.sum(jnp.where(jnp.isfinite(fill_lo), fill_lo, 0))
                    + jnp.sum(jnp.where(jnp.isfinite(fill_hi), fill_hi, 0)))
        return jnp.sum(jax.vmap(one)(e, s))

    for name, fn, args in [
            ("smooth x4", smooth, (energy,)),
            ("segsum", segsum, (energy, smoothed)),
            ("rank+taps", ranktaps, (energy, smoothed)),
            ("segscan", segscan, (energy, smoothed)),
            ("scatterfill", scatterfill, (energy, smoothed))]:
        dt, cs = timed(jax.jit(fn), *args)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


def extra_main():
    """Phase 2: sort-merge feasibility + rank+taps ablation."""
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "334"))
    B = int(os.environ.get("SST_BANDS", "4096"))

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        keys = jax.random.randint(k1, (batch, nB, 2 * B), 0, 2 * B,
                                  jnp.int32)
        pay = jax.random.normal(k2, (batch, 5, nB, 2 * B), jnp.float32)
        return keys, pay

    keys, pay = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def sort1(k, p):
        def one(kk, pp):
            out = jax.lax.sort([kk] + [pp[i] for i in range(5)],
                               dimension=-1, num_keys=1)
            return sum(jnp.sum(o) for o in out[1:])
        return jnp.sum(jax.vmap(one)(k, jnp.moveaxis(p, 1, 0)
                                     if False else p))

    def sort2(k, p):
        def one(kk, pp):
            out = jax.lax.sort([kk] + [pp[i] for i in range(5)],
                               dimension=-1, num_keys=1)
            k2 = (out[1] > 0).astype(jnp.int32) * (2 * B) + kk
            out2 = jax.lax.sort([k2] + list(out[1:]), dimension=-1,
                                num_keys=1)
            return sum(jnp.sum(o) for o in out2[1:])
        return jnp.sum(jax.vmap(one)(k, p))

    def fills(k, p):
        # 6 directional assoc-scan fills at [nB, 2B] (the fill side)
        def one(kk, pp):
            t = jnp.float32(0)
            for i in range(3):
                f = jax.lax.associative_scan(jnp.maximum, pp[i], axis=-1)
                r = jax.lax.associative_scan(jnp.minimum,
                                             pp[i + 1][..., ::-1], axis=-1)
                t += jnp.sum(f) + jnp.sum(r)
            return t
        return jnp.sum(jax.vmap(one)(k, p))

    for name, fn in [("sort1x", sort1), ("sort2x", sort2),
                     ("fills6", fills)]:
        dt, cs = timed(jax.jit(fn), keys, pay)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


def slices_main():
    """Isolate the vmapped-dynamic-slice cost of the windowed rank+taps:
    [nB x nchunk] window slices of [n, L] per clip, batch-vmapped."""
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "334"))
    B = int(os.environ.get("SST_BANDS", "4096"))
    nseg = B // 2 + 2
    C, L = wavefront._rank_geometry(4.0)
    nchunk = -(-B // C)
    n = 2
    print(f"C={C} L={L} nchunk={nchunk} slices/clip={nB*nchunk}", flush=True)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        tz = jax.random.normal(k1, (batch, nB, n, nseg + 2 * L), jnp.float32)
        a = jnp.sort(jax.random.randint(k2, (batch, nB, nchunk), 0, nseg,
                                        jnp.int32), axis=-1)
        return tz, a

    tz, a = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def slices(tzb, ab):
        def one(tzr, ar):      # [nB, n, nseg+2L], [nB, nchunk]
            def slt(row, s0):
                return jax.lax.dynamic_slice(row, (0, s0 + L), (n, L))
            w = jax.vmap(jax.vmap(slt, in_axes=(None, 0)),
                         in_axes=(0, 0))(tzr, ar)
            return jnp.sum(w)
        return jnp.sum(jax.vmap(one)(tzb, ab))

    def onehot_einsum(tzb, ab):
        # the M-matmul side at the same shapes (kloc fake)
        def one(tzr, ar):
            kloc = (ar[:, :, None] + jnp.arange(C)[None, None]) % L
            wio = jnp.arange(L, dtype=jnp.int32)
            M = jnp.where(kloc[..., None] == wio, jnp.float32(1),
                          jnp.float32(0))      # [nB, nchunk... wait
            return jnp.sum(M)
        return jnp.sum(jax.vmap(one)(tzb[..., :1, :1] * 0 + 1.0,
                                     ab))

    for name, fn in [("slices", slices)]:
        dt, cs = timed(jax.jit(fn), tz, a)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    if os.environ.get("SST_MAP_SLICES") == "1":
        slices_main()
    elif os.environ.get("SST_MAP_EXTRA") == "1":
        extra_main()
    else:
        main()
