"""Fused Pallas wavefront sweep: diagonal recursion + in-kernel unskew.

Replaces the XLA `run_group` scan + `unskew_group` + assembly transposes for
the pair-cell, pe-from-pi, 2-channel configuration (the headline path).  One
sequential (batch-tile, diagonal-chunk) grid:

  - the longv-deep recursion ring lives in VMEM scratch across chunks
    (reference recursion: signalsmith-stretch.h:722-803);
  - each chunk's K=32 cells run on [BT, GR] VPU tiles, with the lane shift
    done ONCE at production as a stacked [nch*BT, GR] @ [GR, GR] exact
    permutation matmul (bit-exact: each output lane sums one x*1.0);
  - emitted diagonals land in a [RW] VMEM ring; every CB/K chunks a
    butterfly lane-shifter realigns the last CB + (GR-1)*step diagonals
    (out[r, b] = ring[b + r*step, r] -> log2(GR) static sublane-axis shifts
    selected per lane bit) and one in-VMEM [CB, GR] -> [GR, CB] transpose
    writes the UNSKEWED bands-minor output block.

The XLA path materializes the scan's diagonal-major buffer in HBM and pays
reshape/concat/slice + global transposes to unskew it; here the unskew is
VMEM-local and the only HBM traffic is the xs read and the final [nch,
batch, GR, bands] write.  Values are bit-exact vs the XLA pair cell (gated
by tests/test_pallas_sweep.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = np.float32
NOISE_FLOOR = 1e-15
CB = 512          # output bin-chunk (bands must be a multiple)
RW = 2048         # diagonal ring depth (>= CB + (GR-1)*step + K)


def _make_output_pair(pe, pir, pii, phr, phi):
    pn = phr * phr + phi * phi
    weak = pn <= f32(NOISE_FLOOR)
    fn_ = pir * pir + pii * pii
    p2r = jnp.where(weak, pir, phr)
    p2i = jnp.where(weak, pii, phi)
    pn2 = jnp.where(weak, fn_ + f32(NOISE_FLOOR), pn)
    s = jnp.sqrt(pe / pn2)
    return p2r * s, p2i * s


def supported(longv: int, ch: int, pe_from_pi: bool, pair: bool,
              bands: int, D: int, K: int, GR: int) -> bool:
    """The kernel covers the headline configuration; everything else keeps
    the XLA scan (mapped/formant configs carry extra planes and the CPU
    backend has no Mosaic)."""
    step = longv + 1
    return (pair and pe_from_pi and ch == 2 and GR == 128 and K == 32
            and bands % CB == 0 and D % K == 0
            and CB + (GR - 1) * step + K <= RW
            and jax.default_backend() not in ("cpu",))


def run_group(xs, inj, *, batch, GR, D, K, BT, bands, longv):
    """xs [S, K, P=12, batch, GR] f32 (skewed planes: 8 vote coefficients +
    4 pi); inj [S, K, 2, ch, 2, batch] f32 lane-0 injections.  Returns the
    UNSKEWED [nch=4, batch, GR, bands] f32 output planes (nch = ch * 2
    re/im), equal to unskew_group(run_group(xs)) of the XLA path."""
    ch = 2
    nch = 2 * ch
    P = 12
    step = longv + 1
    S = D // K
    nE = bands // CB
    wing = (GR - 1) * step + 1
    emit_s = [-(-((e + 1) * CB + wing - 1) // K) - 1 for e in range(nE)]
    stride = CB // K
    nbits = GR.bit_length() - 1            # 7 butterfly stages for GR=128
    inj_r = inj.reshape(S, K, 2, ch, 2, batch, 1)

    sh_mat = np.zeros((GR, GR), np.float32)
    sh_mat[np.arange(GR - 1), np.arange(1, GR)] = 1.0
    sh_const = jnp.asarray(sh_mat)

    def kernel(xs_ref, inj_ref, sh_ref, out_ref, ring_ref, dring_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            ring_ref[...] = jnp.zeros_like(ring_ref)

        lane0 = jax.lax.broadcasted_iota(jnp.int32, (BT, GR), 1) == 0
        ring = [tuple(tuple(ring_ref[l, v, p] for p in range(nch))
                      for v in range(2)) for l in range(longv)]
        dn = (((1,), (0,)), ((), ()))

        em = []
        for j in range(K):
            x = [xs_ref[0, j, p] for p in range(P)]
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
            omr, omi = _make_output_pair(pem, pimr, pimi, phr, phi)
            outs = []
            for c, (pcr, pci, pec) in enumerate(
                    ((pi0r, pi0i, pe0), (pi1r, pi1i, pe1))):
                ctr = pcr * pimr + pci * pimi
                cti = pci * pimr - pcr * pimi
                tr = omr * ctr - omi * cti
                ti = omr * cti + omi * ctr
                lcr, lci = _make_output_pair(pec, pcr, pci, tr, ti)
                main = m if c == 1 else ~m
                outs += [jnp.where(main, omr, lcr),
                         jnp.where(main, omi, lci)]
            stk = jnp.concatenate(outs, axis=0)
            sstk = jax.lax.dot_general(stk, sh_ref[...], dn,
                                       preferred_element_type=jnp.float32,
                                       precision="highest")
            souts = tuple(sstk[p * BT:(p + 1) * BT] for p in range(nch))
            ring = ring[1:] + [(tuple(outs), souts)]
            em.append(outs)
        for l in range(longv):
            for p in range(nch):
                ring_ref[l, 0, p] = ring[l][0][p]
                ring_ref[l, 1, p] = ring[l][1][p]
        pos = (s % (RW // K)) * K
        for n in range(nch):
            # [K, BT, GR]: every T-row is one full (sublane, lane) tile
            dring_ref[n, pl.ds(pos, K)] = jnp.stack(
                [em[j][n] for j in range(K)], 0)

        # SST_V3_EMIT ablation (profiling only): skip = no emission at
        # all; nobf = slice+transpose without the butterfly realign
        emit_mode = os.environ.get("SST_V3_EMIT", "full")
        for e in range(nE):
            if emit_mode == "skip":
                break
            @pl.when(s == emit_s[e])
            def _(e=e):
                start = (e * CB) % RW
                WN = CB + 1024           # >= CB + wing, slack never read
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, GR), 2)
                for n in range(nch):
                    # full-tile butterfly: the shift runs along T for all
                    # BT sublanes at once; the lane mask broadcasts
                    if start + WN <= RW:
                        Wp = dring_ref[n, pl.ds(start, WN)]
                    else:
                        n1 = RW - start
                        Wp = jnp.concatenate(
                            [dring_ref[n, pl.ds(start, n1)],
                             dring_ref[n, pl.ds(0, WN - n1)]], 0)
                    if emit_mode == "full":
                        for i in range(nbits):
                            off = step * (1 << i)
                            sh = jnp.concatenate(
                                [Wp[off:],
                                 jnp.zeros((off, BT, GR), Wp.dtype)], 0)
                            Wp = jnp.where((lane & (1 << i)) != 0, sh, Wp)
                    out_ref[n] = jnp.transpose(Wp[:CB], (1, 2, 0))

    grid = (batch // BT, S)
    first_emit = emit_s[0] - stride + 1
    return pl.pallas_call(
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
        out_specs=pl.BlockSpec(
            (nch, BT, GR, CB),
            lambda b, s: (0, b, 0,
                          jnp.clip((s - first_emit) // stride, 0, nE - 1)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, batch, GR, bands), jnp.float32),
        scratch_shapes=[pltpu.VMEM((longv, 2, nch, BT, GR), jnp.float32),
                        pltpu.VMEM((nch, RW, BT, GR), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=os.environ.get("SST_PALLAS_INTERP") == "1",
    )(xs, inj_r, sh_const)
