"""Pallas windowed fractional interpolation (the mapped planner's gathers).

Drop-in compute core for wavefront.interp_planes_window_multi: exact
floor/ceil tap selection of n source planes at several monotone-ish,
gradient-bounded position sets (reference gather sites:
signalsmith-stretch.h:697-719 prelim lookups, :744-786 vote positions,
:984-1007 formant taps).

The XLA formulation materializes, per (row, 64-bin chunk), a dynamic [n, L]
window slice and a one-hot [C, L] selection matrix in HBM — measured ~22 GB
of traffic per position set at bench shapes and ~1 s of the mapped plan.
Here each grid step holds ONE row's planes resident in VMEM ([n, W0p] is
~100 KB), loops the row's 128-bin chunks, extracts each chunk's window with
a sublane-granular dynamic slice (the anchor is rounded down to a lane-tile
multiple so the slice moves whole (8, 128) tiles), builds the [WT, 128]
one-hot in registers, and selects taps with two small HIGHEST-precision
matmuls (bit-exact: 0/1 weights are exact in every bf16 pass and adding
zeros is exact).  Nothing but the planes, positions and outputs ever
touches HBM.

Out-of-window-capacity taps are zeroed and counted (same contract and
`violations` semantics as the XLA path)."""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 128          # output bin chunk per inner iteration


def interp_multi(planes, pos_sets, L):
    """planes [nB, n, W0] f32; pos_sets list of (pos [nB, B] f32, nsel,
    taps); L = window capacity from wavefront._window_geometry.  Returns
    (list of per-set results, violations) exactly like
    interp_planes_window_multi."""
    nB, n, W0 = planes.shape
    B = pos_sets[0][0].shape[1]
    assert B % CB == 0
    nsets = len(pos_sets)
    WT = (-(-(L + CB) // 128)) * 128 + 128   # window + anchor-alignment slack
    PADF = (-(-L // 128)) * 128              # front zero pad, lane-aligned
    W0p = PADF + (-(-(W0 + L) // 128)) * 128
    planes_p = jnp.pad(planes, ((0, 0), (0, 0), (PADF, W0p - PADF - W0)))
    planes_t = planes_p.reshape(nB, n, W0p // 128, 128)

    li = jnp.stack([jnp.floor(p).astype(jnp.int32) for p, _, _ in pos_sets],
                   axis=1)                               # [nB, nsets, B]
    frac = jnp.stack([(p - jnp.floor(p)).astype(jnp.float32)
                      for p, _, _ in pos_sets], axis=1)

    nout = sum((2 * nsel if taps else nsel) for _, nsel, taps in pos_sets)
    statics = tuple((nsel, taps) for _, nsel, taps in pos_sets)

    out, bad = _call(planes_t, li, frac, statics=statics, n=n, W0=W0,
                     W0p=W0p, PADF=PADF, WT=WT, B=B, nout=nout)
    bad = bad[:, 0, 0]
    results, o = [], 0
    for _, nsel, taps in pos_sets:
        if taps:
            results.append((out[:, o:o + nsel], out[:, o + nsel:o + 2 * nsel]))
            o += 2 * nsel
        else:
            results.append(out[:, o:o + nsel])
            o += nsel
    return results, jnp.sum(bad)


@functools.partial(jax.jit, static_argnames=("statics", "n", "W0", "W0p",
                                             "PADF", "WT", "B", "nout"))
def _call(planes_t, li, frac, *, statics, n, W0, W0p, PADF, WT, B, nout):
    nB, nsets = li.shape[:2]
    nchunk = B // CB

    def kernel(pt_ref, li_ref, fr_ref, out_ref, bad_ref):
        wio = jax.lax.broadcasted_iota(jnp.int32, (WT, CB), 0)
        total_bad = jnp.int32(0)
        for c in range(nchunk):
            li_cs = [li_ref[0, k, c * CB:(c + 1) * CB] for k in range(nsets)]
            amin = functools.reduce(
                jnp.minimum, [jnp.min(x) for x in li_cs])
            ws = jnp.clip(((amin - 1 + PADF) >> 7) << 7, 0, W0p - WT)
            win = pt_ref[0, :, pl.ds(ws >> 7, WT // 128), :].reshape(n, WT)
            win_h = jnp.concatenate(
                [win[:, 1:], jnp.zeros((n, 1), win.dtype)], 1)
            o = 0
            for k, (nsel, taps) in enumerate(statics):
                lic = li_cs[k]
                rel = lic + PADF - ws                     # [CB]
                vlo = (lic >= 0) & (lic < W0)
                total_bad += jnp.sum(
                    (vlo & ((rel < 0) | (rel > WT - 2))).astype(jnp.int32))
                M = jnp.where(wio == rel[None, :], jnp.float32(1),
                              jnp.float32(0))             # [WT, CB]
                dn = (((1,), (0,)), ((), ()))
                lo = jax.lax.dot_general(
                    win[:nsel], M, dn,
                    preferred_element_type=jnp.float32,
                    precision="highest")                  # [nsel, CB]
                hi = jax.lax.dot_general(
                    win_h[:nsel], M, dn,
                    preferred_element_type=jnp.float32,
                    precision="highest")
                if taps:
                    out_ref[0, o:o + nsel, c * CB:(c + 1) * CB] = lo
                    out_ref[0, o + nsel:o + 2 * nsel,
                            c * CB:(c + 1) * CB] = hi
                    o += 2 * nsel
                else:
                    fc = fr_ref[0, k, c * CB:(c + 1) * CB][None]
                    out_ref[0, o:o + nsel, c * CB:(c + 1) * CB] = (
                        lo + (hi - lo) * fc)
                    o += nsel
        # a scalar per row, but blocks must tile (8, 128): broadcast into
        # one VMEM tile; callers read [, 0, 0]
        bad_ref[0] = jnp.full((8, 128), total_bad, jnp.int32)

    out, bad = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=[
            pl.BlockSpec((1, n, W0p // 128, 128), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsets, B), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsets, B), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nout, B), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nB, nout, B), jnp.float32),
            jax.ShapeDtypeStruct((nB, 8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=os.environ.get("SST_PALLAS_INTERP") == "1",
    )(planes_t, li, frac)
    return out, bad
