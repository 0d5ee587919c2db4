#!/usr/bin/env python
"""Pallas wavefront-sweep prototype at bench shapes (headline config:
ch=2, pair cell, pe_from_pi, no carry_mc).

The XLA sweep streams a materialized xs [S, K, P, batch, GR] through
lax.scan (write 3.9 GB + read 3.9 GB + emission); measured sweep-only is
~126 ms of the 315 ms render (tools/profile_stages).  This kernel keeps the
ring carry in VMEM scratch across a sequential (batch-tile, S) grid, runs
the K=32 cells per step on [BT, GR=128] VPU tiles, and writes the dus-layout
output block directly — the scan's per-step HBM ring round-trip and the
stacked-ys/dus emission machinery disappear.

Compares numerics + wall time vs a faithful replica of the current
run_group(dus) scan for one row group with random injections.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SST_PALLAS_INTERP") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"      # sitecustomize sets axon
    jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = np.float32
NOISE_FLOOR = 1e-15
longv = 6
step = longv + 1
ch = 2
nch = 2 * ch
P = 12          # 8 vote planes + 4 pi planes (pe_from_pi)


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def make_output_pair(pe, pir, pii, phr, phi):
    pn = phr * phr + phi * phi
    weak = pn <= f32(NOISE_FLOOR)
    fn_ = pir * pir + pii * pii
    p2r = jnp.where(weak, pir, phr)
    p2i = jnp.where(weak, pii, phi)
    pn2 = jnp.where(weak, fn_ + f32(NOISE_FLOOR), pn)
    s = jnp.sqrt(pe / pn2)
    return p2r * s, p2i * s


# --------------------------------------------------------------------------
# reference: faithful replica of wavefront.run_group (pair cell, dus emit)
# --------------------------------------------------------------------------
def ref_run_group(xs, inj, batch, GR, D, K):
    def cell_pair(ring_list, x, j, ij):
        V, PE, PI = x
        prevl = ring_list[0]
        prev1 = ring_list[-1]
        pe = PE[j]
        pi = PI[j]
        mc1 = pe[1] > pe[0]

        def sel(X, axis_ch=0):
            return jnp.where(mc1, jnp.take(X, 1, axis_ch),
                             jnp.take(X, 0, axis_ch))

        both = jnp.stack([prevl, prev1])
        sh = jnp.concatenate([ij[j][..., None], both[..., :-1]], -1)
        cat = jnp.stack([sh[0], sh[1], both[1], both[0]])
        W = sel(cat, 1)
        Pr = V[j, :, 0] * W[:, 0] - V[j, :, 1] * W[:, 1]
        Pi = V[j, :, 0] * W[:, 1] + V[j, :, 1] * W[:, 0]
        phr = ((Pr[0] + Pr[1]) + Pr[2]) + Pr[3]
        phi = ((Pi[0] + Pi[1]) + Pi[2]) + Pi[3]
        pe_m = sel(pe)
        pim = sel(pi)
        omr, omi = make_output_pair(pe_m, pim[0], pim[1], phr, phi)
        om = jnp.stack([omr, omi])
        ctr = pi[:, 0] * pim[0] + pi[:, 1] * pim[1]
        cti = pi[:, 1] * pim[0] - pi[:, 0] * pim[1]
        tr = omr * ctr - omi * cti
        ti = omr * cti + omi * ctr
        lr, li = make_output_pair(pe, pi[:, 0], pi[:, 1], tr, ti)
        lk = jnp.stack([lr, li], 1)
        mask = jnp.stack([~mc1, mc1])[:, None]
        return jnp.where(mask, om[None], lk)

    def unpack_pair(row):
        V = row[:, :8].reshape(K, 4, 2, batch, -1)
        PI = row[:, 8:8 + 2 * ch].reshape(K, ch, 2, batch, -1)
        PE = PI[:, :, 0] * PI[:, :, 0] + PI[:, :, 1] * PI[:, :, 1]
        return V, PE, PI

    def body(carry, xy):
        ring, buf = carry
        row, ij, joff = xy
        x = unpack_pair(row)
        ring_list = [ring[l] for l in range(longv)]
        emitted = []
        for j in range(K):
            outs = cell_pair(ring_list, x, j, ij)
            ring_list = ring_list[1:] + [outs]
            emitted.append(outs)
        ring2 = jnp.stack(ring_list, 0)
        em = jnp.stack(emitted, 0).reshape(K, nch, batch, GR)
        win = jnp.transpose(em, (1, 2, 3, 0))
        buf2 = jax.lax.dynamic_update_slice(buf, win, (0, 0, 0, joff))
        return (ring2, buf2), None

    ring0 = jnp.zeros((longv, ch, 2, batch, GR), jnp.float32)
    buf0 = jnp.zeros((nch, batch, GR, D), jnp.float32)
    offs = jnp.arange(D // K, dtype=jnp.int32) * K
    (_, buf), _ = jax.lax.scan(body, (ring0, buf0), (xs, inj, offs))
    return buf


# --------------------------------------------------------------------------
# pallas kernel
# --------------------------------------------------------------------------
def pallas_run_group(xs, inj, batch, GR, D, K, BT):
    """Mosaic needs the out block's minor dim divisible by 128, so the out
    block covers KB=128 diagonal columns while each grid step computes K=32
    cells: the step's emissions land in a VMEM scratch (static-index
    stores), then ONE of four predicated bulk copies moves them to the
    resident out block (whose index s//4 is constant across the 4 phases).
    The ring carry lives in VMEM scratch across the sequential
    (batch-tile, S) grid; K stays 32 so the unrolled live set fits in
    registers (a 128-cell unroll spilled 449 MB)."""
    S = D // K
    KB = 128
    phases = KB // K
    # inj with a trailing singleton so per-(w,c,ri) heads read as [BT, 1]
    inj_r = inj.reshape(S, K, 2, ch, 2, batch, 1)

    # lane-shift as an exact permutation matmul: out = x @ SH with
    # SH[l-1, l] = 1 puts x[.., l-1] at lane l (head lane 0 <- 0, then the
    # injected head rides in via a lane-0 select).  Bit-exact: each output
    # sums one x*1.0 (bf16(1.0) is exact, hi+lo split recombines exactly at
    # f32 accumulate) and 127 x*0.0 — and ~100x faster in Mosaic than
    # pltpu.roll, which lowered the K=32 body to ~260 us/step.
    sh_mat = np.zeros((GR, GR), np.float32)
    sh_mat[np.arange(GR - 1), np.arange(1, GR)] = 1.0
    sh_const = jnp.asarray(sh_mat)

    def kernel(xs_ref, inj_ref, sh_ref, out_ref, ring_ref, em_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        lane0 = jax.lax.broadcasted_iota(jnp.int32, (BT, GR), 1) == 0
        ring = [tuple(ring_ref[l, p] for p in range(nch))
                for l in range(longv)]
        dn = (((1,), (0,)), ((), ()))

        def shift_in(t, head):
            r = jax.lax.dot_general(t, sh_ref[...], dn,
                                    preferred_element_type=jnp.float32,
                                    precision="highest")
            return jnp.where(lane0, head, r)

        for j in range(K):
            x = [xs_ref[0, j, p] for p in range(P)]     # each [BT, GR]
            a1r, a1i, a2r, a2i, d1r, d1i, d2r, d2i = x[:8]
            pi0r, pi0i, pi1r, pi1i = x[8:12]
            pe0 = pi0r * pi0r + pi0i * pi0i
            pe1 = pi1r * pi1r + pi1i * pi1i
            m = pe1 > pe0
            prevl, prev1 = ring[0], ring[-1]
            # up votes: lane-shifted prevl / prev1 with injected heads
            shL = [shift_in(prevl[c * 2 + ri], inj_ref[0, j, 0, c, ri])
                   for c in range(ch) for ri in range(2)]
            sh1 = [shift_in(prev1[c * 2 + ri], inj_ref[0, j, 1, c, ri])
                   for c in range(ch) for ri in range(2)]

            def selp(planes):
                return (jnp.where(m, planes[2], planes[0]),
                        jnp.where(m, planes[3], planes[1]))

            u1r, u1i = selp(shL)
            ulr, uli = selp(sh1)
            dn1r, dn1i = selp(prev1)
            dnlr, dnli = selp(prevl)
            v0r = a1r * u1r - a1i * u1i
            v0i = a1r * u1i + a1i * u1r
            v1r = a2r * ulr - a2i * uli
            v1i = a2r * uli + a2i * ulr
            v2r = d1r * dn1r - d1i * dn1i
            v2i = d1r * dn1i + d1i * dn1r
            v3r = d2r * dnlr - d2i * dnli
            v3i = d2r * dnli + d2i * dnlr
            phr = ((v0r + v1r) + v2r) + v3r
            phi = ((v0i + v1i) + v2i) + v3i
            pem = jnp.where(m, pe1, pe0)
            pimr = jnp.where(m, pi1r, pi0r)
            pimi = jnp.where(m, pi1i, pi0i)
            omr, omi = make_output_pair(pem, pimr, pimi, phr, phi)
            outs = []
            for c, (pcr, pci, pec) in enumerate(
                    ((pi0r, pi0i, pe0), (pi1r, pi1i, pe1))):
                ctr = pcr * pimr + pci * pimi
                cti = pci * pimr - pcr * pimi
                tr = omr * ctr - omi * cti
                ti = omr * cti + omi * ctr
                lcr, lci = make_output_pair(pec, pcr, pci, tr, ti)
                main = m if c == 1 else ~m
                outs += [jnp.where(main, omr, lcr),
                         jnp.where(main, omi, lci)]
            ring = ring[1:] + [tuple(outs)]
            # em scratch is [nch, K, BT, GR]: the store is layout-preserving
            # (GR stays on lanes); the K->minor relayout happens ONCE per
            # step in the bulk phase copy below, not per store (a per-store
            # [BT,GR]->K-minor write is a full transpose each time)
            for p in range(nch):
                em_ref[p, j] = outs[p]
        for l in range(longv):
            for p in range(nch):
                ring_ref[l, p] = ring[l][p]
        for c in range(phases):
            @pl.when(s % phases == c)
            def _(c=c):
                for p in range(nch):
                    out_ref[p, :, :, c * K:(c + 1) * K] = jnp.transpose(
                        em_ref[p], (1, 2, 0))

    grid = (batch // BT, S)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, P, BT, GR),
                         lambda b, s: (s, 0, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 2, ch, 2, BT, 1),
                         lambda b, s: (s, 0, 0, 0, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GR, GR), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nch, BT, GR, KB),
                               lambda b, s: (0, b, 0, s // phases),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, batch, GR, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((longv, nch, BT, GR), jnp.float32),
                        pltpu.VMEM((nch, K, BT, GR), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=os.environ.get("SST_PALLAS_INTERP") == "1",
    )(xs, inj_r, sh_const)
    return out


# --------------------------------------------------------------------------
# pallas kernel v2: production-time shift
# --------------------------------------------------------------------------
def pallas_run_group2(xs, inj, batch, GR, D, K, BT):
    """v1 pays 8 lane-shift matmuls per cell (shifting ring[0]/ring[-1] at
    every consumption site).  Each ring entry is consumed shifted exactly
    twice (as prev1 next step, as prevl longv steps later) with the SAME
    shift, so shift ONCE at production: stack the 4 emitted planes into one
    [4*BT, GR] @ [GR, GR] matmul (2x fewer shift FLOPs, 8x fewer MXU
    dispatches) and carry (outs, shifted outs) in the ring.  Consumers only
    pay the lane-0 injection select.  Bit-exact: the shift matmul is the
    same highest-precision permutation product as v1's."""
    S = D // K
    KB = 128
    phases = KB // K
    inj_r = inj.reshape(S, K, 2, ch, 2, batch, 1)

    sh_mat = np.zeros((GR, GR), np.float32)
    sh_mat[np.arange(GR - 1), np.arange(1, GR)] = 1.0
    sh_const = jnp.asarray(sh_mat)

    def kernel(xs_ref, inj_ref, sh_ref, out_ref, ring_ref, em_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        lane0 = jax.lax.broadcasted_iota(jnp.int32, (BT, GR), 1) == 0
        # ring entry: [2(plain|shifted), nch, BT, GR]
        ring = [tuple(tuple(ring_ref[l, v, p] for p in range(nch))
                      for v in range(2)) for l in range(longv)]
        dn = (((1,), (0,)), ((), ()))

        for j in range(K):
            x = [xs_ref[0, j, p] for p in range(P)]     # each [BT, GR]
            a1r, a1i, a2r, a2i, d1r, d1i, d2r, d2i = x[:8]
            pi0r, pi0i, pi1r, pi1i = x[8:12]
            pe0 = pi0r * pi0r + pi0i * pi0i
            pe1 = pi1r * pi1r + pi1i * pi1i
            m = pe1 > pe0
            (prevl, sprevl), (prev1, sprev1) = ring[0], ring[-1]
            shL = [jnp.where(lane0, inj_ref[0, j, 0, c, ri],
                             sprevl[c * 2 + ri])
                   for c in range(ch) for ri in range(2)]
            sh1 = [jnp.where(lane0, inj_ref[0, j, 1, c, ri],
                             sprev1[c * 2 + ri])
                   for c in range(ch) for ri in range(2)]

            def selp(planes):
                return (jnp.where(m, planes[2], planes[0]),
                        jnp.where(m, planes[3], planes[1]))

            u1r, u1i = selp(shL)
            ulr, uli = selp(sh1)
            dn1r, dn1i = selp(prev1)
            dnlr, dnli = selp(prevl)
            v0r = a1r * u1r - a1i * u1i
            v0i = a1r * u1i + a1i * u1r
            v1r = a2r * ulr - a2i * uli
            v1i = a2r * uli + a2i * ulr
            v2r = d1r * dn1r - d1i * dn1i
            v2i = d1r * dn1i + d1i * dn1r
            v3r = d2r * dnlr - d2i * dnli
            v3i = d2r * dnli + d2i * dnlr
            phr = ((v0r + v1r) + v2r) + v3r
            phi = ((v0i + v1i) + v2i) + v3i
            pem = jnp.where(m, pe1, pe0)
            pimr = jnp.where(m, pi1r, pi0r)
            pimi = jnp.where(m, pi1i, pi0i)
            omr, omi = make_output_pair(pem, pimr, pimi, phr, phi)
            outs = []
            for c, (pcr, pci, pec) in enumerate(
                    ((pi0r, pi0i, pe0), (pi1r, pi1i, pe1))):
                ctr = pcr * pimr + pci * pimi
                cti = pci * pimr - pcr * pimi
                tr = omr * ctr - omi * cti
                ti = omr * cti + omi * ctr
                lcr, lci = make_output_pair(pec, pcr, pci, tr, ti)
                main = m if c == 1 else ~m
                outs += [jnp.where(main, omr, lcr),
                         jnp.where(main, omi, lci)]
            # production-time shift: one stacked permutation matmul
            stk = jnp.concatenate(outs, axis=0)         # [nch*BT, GR]
            sstk = jax.lax.dot_general(stk, sh_ref[...], dn,
                                       preferred_element_type=jnp.float32,
                                       precision="highest")
            souts = tuple(sstk[p * BT:(p + 1) * BT] for p in range(nch))
            ring = ring[1:] + [(tuple(outs), souts)]
            for p in range(nch):
                em_ref[p, j] = outs[p]
        for l in range(longv):
            for p in range(nch):
                ring_ref[l, 0, p] = ring[l][0][p]
                ring_ref[l, 1, p] = ring[l][1][p]
        for c in range(phases):
            @pl.when(s % phases == c)
            def _(c=c):
                for p in range(nch):
                    out_ref[p, :, :, c * K:(c + 1) * K] = jnp.transpose(
                        em_ref[p], (1, 2, 0))

    grid = (batch // BT, S)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, P, BT, GR),
                         lambda b, s: (s, 0, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 2, ch, 2, BT, 1),
                         lambda b, s: (s, 0, 0, 0, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GR, GR), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nch, BT, GR, KB),
                               lambda b, s: (0, b, 0, s // phases),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, batch, GR, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((longv, 2, nch, BT, GR), jnp.float32),
                        pltpu.VMEM((nch, K, BT, GR), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=os.environ.get("SST_PALLAS_INTERP") == "1",
    )(xs, inj_r, sh_const)
    return out


# v3 (fused sweep + unskew) now lives in the product tree; the tool
# measures the production kernel directly.
from signalsmith_stretch_tpu.ops.pallas import sweep as _prod_sweep


def pallas_run_group3(xs, inj, batch, GR, D, K, BT, bands):
    return _prod_sweep.run_group(xs, inj, batch=batch, GR=GR, D=D, K=K,
                                 BT=BT, bands=bands, longv=longv)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    B = 4096
    K = 32
    GR = 128
    BT = int(os.environ.get("SST_PALLAS_BT", "16"))
    align = K * 128 // np.gcd(K, 128)
    D = -(-(B + (GR - 1) * step) // align) * align
    if os.environ.get("SST_PALLAS_D"):       # small-D lowering check
        D = int(os.environ["SST_PALLAS_D"])
    S = D // K
    print(f"shapes: S={S} K={K} D={D} GR={GR} BT={BT} "
          f"xs={S*K*P*batch*GR*4/2**30:.2f} GiB", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # xs with realistic magnitude; pad wings zero like the real skew
    xs = jax.block_until_ready(jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (S, K, P, batch, GR), jnp.float32))(k1))
    inj = jax.block_until_ready(jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (S, K, 2, ch, 2, batch), jnp.float32))(k2))

    f_ref = jax.jit(functools.partial(ref_run_group, batch=batch, GR=GR,
                                      D=D, K=K))
    f_pal = jax.jit(functools.partial(pallas_run_group, batch=batch, GR=GR,
                                      D=D, K=K, BT=BT))

    if os.environ.get("SST_SKIP_REF") != "1":
        dt, cs = timed(lambda x, i: jnp.sum(jnp.abs(f_ref(x, i))), xs, inj)
        print(f"ref scan   : {dt*1e3:7.1f} ms (compile {cs:.0f}s)",
              flush=True)
    dt, cs = timed(lambda x, i: jnp.sum(jnp.abs(f_pal(x, i))), xs, inj)
    print(f"pallas     : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)
    f_pal2 = jax.jit(functools.partial(pallas_run_group2, batch=batch, GR=GR,
                                       D=D, K=K, BT=BT))
    dt, cs = timed(lambda x, i: jnp.sum(jnp.abs(f_pal2(x, i))), xs, inj)
    print(f"pallas v2  : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)

    bands = 4096
    BT3 = int(os.environ.get("SST_PALLAS_BT3", "8"))
    f_pal3 = jax.jit(functools.partial(pallas_run_group3, batch=batch,
                                       GR=GR, D=D, K=K, BT=BT3, bands=bands))
    dt, cs = timed(lambda x, i: jnp.sum(jnp.abs(f_pal3(x, i))), xs, inj)
    print(f"pallas v3  : {dt*1e3:7.1f} ms (compile {cs:.0f}s) [BT={BT3}, "
          f"fused unskew]", flush=True)

    def ref_unskewed(x, i):
        buf = ref_run_group(x, i, batch=batch, GR=GR, D=D, K=K)
        flat = buf.reshape(nch, batch, GR * D)
        tail = jnp.zeros((nch, batch, GR * step), buf.dtype)
        view = jnp.concatenate([flat, tail], 2).reshape(
            nch, batch, GR, D + step)
        return view[..., :bands]

    f_refu = jax.jit(ref_unskewed)
    dt, cs = timed(lambda x, i: jnp.sum(jnp.abs(f_refu(x, i))), xs, inj)
    print(f"ref+unskew : {dt*1e3:7.1f} ms (compile {cs:.0f}s)", flush=True)

    if os.environ.get("SST_SKIP_REF") != "1":
        a = np.asarray(f_ref(xs, inj))
        b = np.asarray(f_pal(xs, inj))
        b2 = np.asarray(f_pal2(xs, inj))
        d = np.abs(a - b)
        rel = d.max() / (np.abs(a).max() + 1e-30)
        print(f"max abs diff {d.max():.3e}  rel {rel:.3e}  "
              f"bitexact={np.array_equal(a, b)}", flush=True)
        print(f"v2 bitexact={np.array_equal(a, b2)} "
              f"(max {np.abs(a - b2).max():.3e})", flush=True)
        au = np.asarray(f_refu(xs, inj))
        b3 = np.asarray(f_pal3(xs, inj))
        print(f"v3 bitexact={np.array_equal(au, b3)} "
              f"(max {np.abs(au - b3).max():.3e})", flush=True)


if __name__ == "__main__":
    main()
