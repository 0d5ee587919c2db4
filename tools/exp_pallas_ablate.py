#!/usr/bin/env python
"""Ablation of the Pallas sweep kernel: which piece costs the ~34 ms?

Variants (cumulative unless noted):
  dataflow   xs read -> em write -> phased out copy (no math, no ring)
  +ring      ring scratch read/rotate/write (no cell math)
  +vpu       full cell VPU math, shifts replaced by unshifted reads
  +shift     the 8 permutation matmuls (= the full v1 kernel)
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

from exp_pallas_sweep import (NOISE_FLOOR, P, ch, longv, make_output_pair,
                              nch, step, timed)


def build(xs, inj, batch, GR, D, K, BT, variant):
    S = D // K
    KB = 128
    phases = KB // K
    inj_r = inj.reshape(S, K, 2, ch, 2, batch, 1)
    sh_mat = np.zeros((GR, GR), np.float32)
    sh_mat[np.arange(GR - 1), np.arange(1, GR)] = 1.0
    sh_const = jnp.asarray(sh_mat)
    f32c = np.float32

    def kernel(xs_ref, inj_ref, sh_ref, out_ref, ring_ref, em_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        lane0 = jax.lax.broadcasted_iota(jnp.int32, (BT, GR), 1) == 0
        use_ring = variant in ("+ring", "+vpu", "+shift")
        use_vpu = variant in ("+vpu", "+shift")
        use_shift = variant == "+shift"
        ring = ([tuple(ring_ref[l, p] for p in range(nch))
                 for l in range(longv)] if use_ring else None)
        dn = (((1,), (0,)), ((), ()))

        def shift_in(t, head):
            if not use_shift:
                return t
            r = jax.lax.dot_general(t, sh_ref[...], dn,
                                    preferred_element_type=jnp.float32,
                                    precision="highest")
            return jnp.where(lane0, head, r)

        for j in range(K):
            x = [xs_ref[0, j, p] for p in range(P)]
            if not use_vpu:
                outs = [x[p] for p in range(nch)]
                if use_ring:
                    ring = ring[1:] + [tuple(outs)]
                for p in range(nch):
                    em_ref[p, j] = outs[p]
                continue
            a1r, a1i, a2r, a2i, d1r, d1i, d2r, d2i = x[:8]
            pi0r, pi0i, pi1r, pi1i = x[8:12]
            pe0 = pi0r * pi0r + pi0i * pi0i
            pe1 = pi1r * pi1r + pi1i * pi1i
            m = pe1 > pe0
            prevl, prev1 = ring[0], ring[-1]
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
            for p in range(nch):
                em_ref[p, j] = outs[p]
        if use_ring:
            for l in range(longv):
                for p in range(nch):
                    ring_ref[l, p] = ring[l][p]
        if variant == "xsonly":
            # keep xs reads + em writes live; skip the out copy entirely
            # (out holds garbage; timing only)
            @pl.when(s == 0)
            def _():
                out_ref[0, :, :, 0:K] = (
                    em_ref[0].sum(0)[..., None]
                    * jnp.ones((BT, GR, K), jnp.float32))
        elif variant == "notr":
            # full out-write volume, but a sum+broadcast instead of the
            # [K,BT,GR]->[BT,GR,K] transpose
            for c in range(phases):
                @pl.when(s % phases == c)
                def _(c=c):
                    for p in range(nch):
                        out_ref[p, :, :, c * K:(c + 1) * K] = (
                            em_ref[p].sum(0)[..., None]
                            * jnp.ones((BT, GR, K), jnp.float32))
        else:
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
            pl.BlockSpec((1, K, P, BT, GR), lambda b, s: (s, 0, 0, b, 0),
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
    )(xs, inj_r, sh_const)
    return out


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    B = 4096
    K = int(os.environ.get("SST_PALLAS_K", "32"))
    GR = 128
    BT = int(os.environ.get("SST_PALLAS_BT", "16"))
    align = K * 128 // np.gcd(K, 128)
    D = -(-(B + (GR - 1) * step) // align) * align
    S = D // K
    print(f"shapes: S={S} K={K} D={D} GR={GR} BT={BT}", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    xs = jax.block_until_ready(jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (S, K, P, batch, GR), jnp.float32))(k1))
    inj = jax.block_until_ready(jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (S, K, 2, ch, 2, batch), jnp.float32))(k2))

    variants = os.environ.get(
        "SST_ABLATE", "xsonly,notr,dataflow,+ring,+vpu,+shift").split(",")
    for variant in variants:
        f = jax.jit(functools.partial(build, batch=batch, GR=GR, D=D, K=K,
                                      BT=BT, variant=variant))
        dt, cs = timed(lambda x, i: jnp.sum(jnp.abs(f(x, i))), xs, inj)
        print(f"{variant:10s}: {dt*1e3:7.1f} ms (compile {cs:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
