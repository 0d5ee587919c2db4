"""Pallas TPU kernel for the main-prediction bin sweep.

The reference's main prediction (signalsmith-stretch.h:722-803) writes bin
outputs in ascending order while reading the *new* outputs of bins b-1 and
b-longVerticalStep — a strict sequential recurrence over bands.  As a
`lax.scan` this costs ~7 µs/step of loop overhead (bands*blocks steps dominate
the whole pipeline); here the sweep runs as one Pallas kernel with the batch
in the minor (lane) dimension:

  layout   [n_tiles, bands, tile]  (tile = batch slice, dense (8,128) tiling)
  grid     (batch_tiles, bin_chunks)    # bin chunks innermost => sequential
  per bin  ~40 vector ops on a (tile,) vector (tile up to 1024 lanes)
  carry    circular window of the last longVerticalStep outputs per channel,
           held in vector registers across the fully-unrolled bin loop and
           persisted to VMEM scratch only at chunk boundaries

All twists/gathers/phase-up votes are precomputed as vectorized XLA ops in
spectral.py; the kernel evaluates only the recurrence:

  phase_b   = phaseUp_b + [b>0] window[mc, b-1]*shortTwist_b
                        + [b>=LV] window[mc, b-LV]*longTwist_b
  out_main  = makeOutput(peMax_b, piMax_b, phase_b)               (:596-603)
  out_c     = c == mc ? out_main
                      : makeOutput(pe_c, pi_c, out_main*chTwist_c) (:791-800)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NOISE_FLOOR = np.float32(1e-15)
LANE = 128


def _make_output(pe, pi_re, pi_im, ph_re, ph_im):
    """Prediction::makeOutput on (re, im) pairs (signalsmith-stretch.h:596-603)."""
    pn = ph_re * ph_re + ph_im * ph_im
    weak = pn <= NOISE_FLOOR
    fn = pi_re * pi_re + pi_im * pi_im
    pre = jnp.where(weak, pi_re, ph_re)
    pim = jnp.where(weak, pi_im, ph_im)
    pn2 = jnp.where(weak, fn + NOISE_FLOOR, pn)
    scale = jnp.sqrt(pe / pn2)
    return pre * scale, pim * scale


def _sweep_kernel(st_re, st_im, lt_re, lt_im, pu_re, pu_im,
                  pe_max, pim_re, pim_im, mc_ref,
                  ct_re, ct_im, pe_all, pia_re, pia_im,
                  out_re, out_im, win_re, win_im,
                  *, ch, longv, bchunk):
    """Flat refs [1, bchunk, tile]; ch refs [ch, 1, bchunk, tile];
    outputs [ch, 1, bchunk, tile]; window scratch [ch, longv, tile]."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        win_re[...] = jnp.zeros_like(win_re)
        win_im[...] = jnp.zeros_like(win_im)

    # window[k][c] = output of channel c at bin (b - longv + k)
    window = [[(win_re[c, k], win_im[c, k]) for c in range(ch)]
              for k in range(longv)]

    for b in range(bchunk):
        mc = mc_ref[0, b]
        zero = jnp.zeros_like(pu_re[0, b])

        oldest, prev = window[0], window[-1]
        d1_re, d1_im, dl_re, dl_im = zero, zero, zero, zero
        for c in range(ch):
            sel = mc == c
            d1_re = jnp.where(sel, prev[c][0], d1_re)
            d1_im = jnp.where(sel, prev[c][1], d1_im)
            dl_re = jnp.where(sel, oldest[c][0], dl_re)
            dl_im = jnp.where(sel, oldest[c][1], dl_im)

        b_global = j * bchunk + b
        sre, sim = st_re[0, b], st_im[0, b]
        lre, lim = lt_re[0, b], lt_im[0, b]
        d1p_re = d1_re * sre - d1_im * sim
        d1p_im = d1_re * sim + d1_im * sre
        dlp_re = dl_re * lre - dl_im * lim
        dlp_im = dl_re * lim + dl_im * lre
        if b == 0:
            has_d1 = b_global > 0
            has_dl = b_global >= longv
            d1p_re = jnp.where(has_d1, d1p_re, zero)
            d1p_im = jnp.where(has_d1, d1p_im, zero)
            dlp_re = jnp.where(has_dl, dlp_re, zero)
            dlp_im = jnp.where(has_dl, dlp_im, zero)
        elif b < longv:
            has_dl = b_global >= longv
            dlp_re = jnp.where(has_dl, dlp_re, zero)
            dlp_im = jnp.where(has_dl, dlp_im, zero)
        ph_re = pu_re[0, b] + d1p_re + dlp_re
        ph_im = pu_im[0, b] + d1p_im + dlp_im

        om_re, om_im = _make_output(pe_max[0, b], pim_re[0, b], pim_im[0, b],
                                    ph_re, ph_im)

        outs = []
        for c in range(ch):
            cre, cim = ct_re[c, 0, b], ct_im[c, 0, b]
            cp_re = om_re * cre - om_im * cim
            cp_im = om_re * cim + om_im * cre
            lk_re, lk_im = _make_output(pe_all[c, 0, b], pia_re[c, 0, b],
                                        pia_im[c, 0, b], cp_re, cp_im)
            sel = mc == c
            o_re = jnp.where(sel, om_re, lk_re)
            o_im = jnp.where(sel, om_im, lk_im)
            out_re[c, 0, b] = o_re
            out_im[c, 0, b] = o_im
            outs.append((o_re, o_im))
        window = window[1:] + [outs]

    for k in range(longv):
        for c in range(ch):
            win_re[c, k] = window[k][c][0]
            win_im[c, k] = window[k][c][1]


@functools.partial(jax.jit, static_argnames=("ch", "longv", "interpret"))
def main_prediction_sweep(st, lt, pu, pe_max, pi_max, mc, ct, pe_all, pi_all,
                          *, ch: int, longv: int, interpret: bool = False):
    """Batched sweep.  Shapes (complex64 unless noted):
      st, lt, pu, pi_max: [N, B]; pe_max [N, B] f32; mc [N, B] int32
      ct, pi_all: [ch, N, B]; pe_all [ch, N, B] f32
    Returns out [ch, N, B] complex64.
    """
    n, bands = pe_max.shape
    sub = max(1, min(8, -(-n // LANE)))
    tile = sub * LANE
    pad_n = -n % tile
    n_tiles = (n + pad_n) // tile
    bchunk = 128
    while bands % bchunk:
        bchunk //= 2
    grid = (n_tiles, bands // bchunk)

    def prep(x):
        x = jnp.moveaxis(x, -2, -1)  # [..., B, N]
        if pad_n:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad_n)])
        x = x.reshape(x.shape[:-1] + (n_tiles, tile))
        return jnp.moveaxis(x, -2, -3)  # [..., n_tiles, B, tile]

    def split(x):
        return prep(x.real), prep(x.imag)

    st_re, st_im = split(st)
    lt_re, lt_im = split(lt)
    pu_re, pu_im = split(pu)
    pim_re, pim_im = split(pi_max)
    ct_re, ct_im = split(ct)
    pia_re, pia_im = split(pi_all)
    pe_max_t = prep(pe_max)
    pe_all_t = prep(pe_all)
    mc_t = prep(mc)

    flat_spec = pl.BlockSpec((1, bchunk, tile), lambda i, j: (i, j, 0))
    ch_spec = pl.BlockSpec((ch, 1, bchunk, tile), lambda i, j: (0, i, j, 0))

    kern = functools.partial(_sweep_kernel, ch=ch, longv=longv, bchunk=bchunk)
    out_re, out_im = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[flat_spec] * 10 + [ch_spec] * 5,
        out_specs=[ch_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((ch, n_tiles, bands, tile),
                                        jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((ch, longv, tile), jnp.float32),
            pltpu.VMEM((ch, longv, tile), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(st_re, st_im, lt_re, lt_im, pu_re, pu_im, pe_max_t, pim_re, pim_im,
      mc_t, ct_re, ct_im, pe_all_t, pia_re, pia_im)

    out = jax.lax.complex(out_re, out_im)          # [ch, n_tiles, B, tile]
    out = jnp.moveaxis(out, -2, -3)                # [ch, B, n_tiles, tile]
    out = out.reshape(ch, bands, -1)[..., :n]      # [ch, B, N]
    return jnp.moveaxis(out, -1, 1).astype(jnp.complex64)
