#!/usr/bin/env python
"""Sub-stage profile of the MAPPED planner at bench shapes (batch 24)."""
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

from signalsmith_stretch_tpu import spectral, wavefront
from signalsmith_stretch_tpu.config import MAX_CLEAN_STRETCH
from signalsmith_stretch_tpu.models import StretchModel
from signalsmith_stretch_tpu.ops import scan_ops

f32 = np.float32


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "24"))
    model = StretchModel.build(channels=2, sample_rate=48000,
                               in_samples=480000, out_samples=480000,
                               semitones=12, tonality_hz=8000)
    plan = model.plan
    consts = plan.consts
    controls, flags = model.controls, model.flags
    nB = len(plan.arrays["new_spectrum"])
    B = consts.bands
    ch = 2

    @jax.jit
    def gen(key):
        c = jax.random.normal(key, (batch, 2 * ch, nB, B), jnp.float32)
        sp = jnp.stack([jax.lax.complex(c[:, 2 * i], c[:, 2 * i + 1])
                        for i in range(ch)], axis=2)
        return sp                      # [batch, nB, ch, B]

    spectra = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    geom = wavefront._window_geometry(flags.inv_grad_bound or 4.0, 0.0)
    print("geometry:", geom, flush=True)

    def smooth(sp):
        energy = jnp.sum(sp.real ** 2 + sp.imag ** 2, axis=2)  # [batch? ...]
        # per clip: [nB, B]
        return energy

    def stage_smooth(sp):
        def one(spc):
            energy = jnp.sum(spc.real ** 2 + spc.imag ** 2, axis=1)
            sm = energy
            e = jnp.zeros(nB, jnp.float32)
            for _ in range(2):
                sm, e = scan_ops.iir_backward(sm, e, f32(consts.slew))
                sm, e = scan_ops.iir_forward(sm, e, f32(consts.slew))
            return jnp.sum(sm)
        return jnp.sum(jax.vmap(one)(sp))

    def stage_peaks(sp):
        def one(spc):
            energy = jnp.sum(spc.real ** 2 + spc.imag ** 2, axis=1)
            sm = energy
            e = jnp.zeros(nB, jnp.float32)
            for _ in range(2):
                sm, e = scan_ops.iir_backward(sm, e, f32(consts.slew))
                sm, e = scan_ops.iir_forward(sm, e, f32(consts.slew))
            ib, fg, bad = wavefront._peaks_and_map_batched(
                energy, sm, controls, flags, consts, geom)
            return jnp.sum(ib) + jnp.sum(fg)
        return jnp.sum(jax.vmap(one)(sp))

    def stage_interp(sp):
        def one(spc):
            in_energy = spc.real ** 2 + spc.imag ** 2   # [nB, ch, B]
            b_f = jnp.arange(B, dtype=jnp.float32)
            pos = jnp.broadcast_to(b_f * f32(0.79), (nB, B))  # synthetic map
            interp = wavefront._WindowInterp(*geom)
            vals = interp([in_energy[:, c] for c in range(ch)]
                          + [spc[:, c] for c in range(ch)], pos)
            t = jnp.float32(0)
            for v in vals:
                t += jnp.sum(jnp.abs(v.real)) + (
                    jnp.sum(jnp.abs(v.imag)) if jnp.iscomplexobj(v) else 0)
            return t
        return jnp.sum(jax.vmap(one)(sp))

    def _plan_prefix(spc, upto):
        # replicate plan_spectral's mapped branch up to a cut point
        nB_, ch_, B_ = spc.shape[0], spc.shape[1], spc.shape[2]
        arrays = plan.arrays
        new = arrays["new_spectrum"]; reanalyse = arrays["reanalyse"]
        tf = np.maximum(arrays["time_factor"], f32(1.0 / MAX_CLEAN_STRETCH))
        rotor = jnp.asarray(consts.rotor)
        idx = np.arange(nB)
        src_input = np.maximum.accumulate(np.where(new, idx, -1))
        m_prev = np.empty(nB, np.int64); m_prev[0] = -1
        m_prev[1:] = src_input[:-1]
        input_eff = spc if (src_input == idx).all() else spc[np.maximum(src_input, 0)]
        if reanalyse.all():
            prev_base = jnp.zeros_like(spc)
        else:
            base_idx = np.where(new & ~reanalyse, np.maximum(m_prev, 0),
                                np.maximum(src_input, 0))
            prev_base = jnp.where(jnp.asarray(reanalyse)[:, None, None],
                                  jnp.zeros_like(spc), spc[base_idx])
        prev_eff = prev_base * rotor if new.all() else prev_base
        in_energy = input_eff.real ** 2 + input_eff.imag ** 2
        acc = jnp.sum(in_energy)
        if upto == "inputs":
            return acc
        energy = jnp.sum(in_energy, axis=1)
        sm = energy
        e = jnp.zeros(nB, jnp.float32)
        for _ in range(2):
            sm, e = scan_ops.iir_backward(sm, e, f32(consts.slew))
            sm, e = scan_ops.iir_forward(sm, e, f32(consts.slew))
        input_bin, freq_grad, bad = wavefront._peaks_and_map_batched(
            energy, sm, controls, flags, consts, geom)
        if upto == "map":
            return acc + jnp.sum(input_bin) + jnp.sum(freq_grad)
        interp = wavefront._WindowInterp(*geom)
        pos_grad = jnp.maximum(f32(0), freq_grad)
        vals = interp([in_energy[:, c] for c in range(ch_)]
                      + [input_eff[:, c] for c in range(ch_)]
                      + [prev_eff[:, c] for c in range(ch_)], input_bin)
        pe = [vals[c] * pos_grad for c in range(ch_)]
        pi = [vals[ch_ + c] for c in range(ch_)]
        prev_i = [vals[2 * ch_ + c] for c in range(ch_)]
        for v in pe + pi + prev_i:
            acc = acc + jnp.sum(jnp.abs(v.real if jnp.iscomplexobj(v) else v))
        if upto == "prelim":
            return acc
        tf_j = jnp.asarray(tf)
        zs = [input_eff[:, c] for c in range(ch_)]
        longv = consts.long_vertical_step
        sd = interp(zs, input_bin - tf_j[:, None])
        ld = interp(zs, input_bin - f32(longv) * tf_j[:, None])
        for v in sd + ld:
            acc = acc + jnp.sum(jnp.abs(v.real))
        return acc

    def mkstage(upto):
        def fn(sp):
            return jnp.sum(jax.vmap(lambda x: _plan_prefix(x, upto))(sp))
        return fn

    def stage_fullplan(sp):
        def one(spc, seed):
            inp = wavefront.plan_spectral(
                spc, jnp.zeros_like(spc), plan.arrays, controls, flags,
                consts, seed)
            t = jnp.float32(0)
            for l in jax.tree_util.tree_leaves(inp):
                if jnp.iscomplexobj(l):
                    t += jnp.sum(jnp.abs(l.real)) + jnp.sum(jnp.abs(l.imag))
                else:
                    t += jnp.sum(jnp.abs(l.astype(jnp.float32)))
            return t
        seeds = jnp.arange(sp.shape[0])
        return jnp.sum(jax.vmap(one)(sp, seeds))

    only = [s for s in os.environ.get("SST_MAPPED_STAGES", "").split(",") if s]
    stages = [("smooth", stage_smooth), ("smooth+peaks", stage_peaks),
              ("interp1", stage_interp),
              ("p:inputs", mkstage("inputs")), ("p:map", mkstage("map")),
              ("p:prelim", mkstage("prelim")), ("p:votes", mkstage("votes")),
              ("full-plan", stage_fullplan)]
    for name, fn in stages:
        if only and name not in only:
            continue
        dt, cs = timed(jax.jit(fn), spectra)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
