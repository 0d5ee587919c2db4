#!/usr/bin/env python
"""Breakdown of plan_spectral (unmapped path) + OLA/assembly on TPU.

Times cumulative jitted prefixes over synthetic spectra at the headline
shape, batch via vmap, checksum sync (see bench.py timing notes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent TPU compile cache: these tools re-run constantly while tuning
# (separate dir from the CPU test cache; see tests/conftest.py note)
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import engine, spectral, stft, wavefront
from signalsmith_stretch_tpu.config import MAX_CLEAN_STRETCH, NOISE_FLOOR
from signalsmith_stretch_tpu.models import StretchModel

f32 = np.float32


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    rate = 48000
    in_len, out_len = 480000, 600000
    model = StretchModel.build(channels=2, sample_rate=rate,
                               in_samples=in_len, out_samples=out_len)
    plan = model.plan
    consts = plan.consts
    arrays = plan.arrays
    controls, flags = model.controls, model.flags
    nB = len(arrays["new_spectrum"])
    B = consts.bands
    ch = 2
    longv = consts.long_vertical_step

    @jax.jit
    def gen(key):
        c = jax.random.normal(key, (batch, 2 * ch * 2, nB, B), jnp.float32)

        def c64(i):
            return jax.lax.complex(c[:, 2 * i], c[:, 2 * i + 1])

        spectra = jnp.stack([c64(c_) for c_ in range(ch)], axis=2)
        prev = jnp.stack([c64(ch + c_) for c_ in range(ch)], axis=2)
        return spectra, prev   # [batch, nB, ch, B]

    spectra, prev = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    new = arrays["new_spectrum"]
    reanalyse = arrays["reanalyse"]
    tf_np = arrays["time_factor"]
    rotor_np = consts.rotor  # keep host-side: c64 device arrays cannot
    # cross back as jit constants on this backend (UNIMPLEMENTED)
    tf = np.maximum(tf_np, f32(1.0 / MAX_CLEAN_STRETCH))
    tf_j = jnp.asarray(tf)
    margin = int(np.ceil(longv * float(tf.max()))) + 2

    def stage_inputs(sp, pv):
        # input/prev chains + energies
        if reanalyse.all():
            prev_base = pv
        else:
            prev_base = pv
        rotor = jnp.asarray(rotor_np)
        prev_eff = prev_base * rotor if new.all() else prev_base
        in_energy = sp.real ** 2 + sp.imag ** 2
        return sp, prev_eff, in_energy

    def stage_c1(sp, pv):
        sp_, prev_eff, in_energy = stage_inputs(sp, pv)
        pe = [in_energy[:, c] for c in range(ch)]
        pi = [sp_[:, c] for c in range(ch)]
        prev_i = [prev_eff[:, c] for c in range(ch)]
        pe_prev = [jnp.concatenate([jnp.zeros((1, B), x.dtype), x[:-1]], 0)
                   for x in pe]
        rotor_eff = jnp.asarray(rotor_np)[None, :]
        c1 = [rotor_eff * (pi[c] * jnp.conj(prev_i[c]))
              / (jnp.maximum(pe_prev[c], pe[c]) + f32(NOISE_FLOOR))
              for c in range(ch)]
        return pi, pe, c1

    def stage_votes(sp, pv):
        pi, pe, c1 = stage_c1(sp, pv)
        outs = []
        for c in range(ch):
            z = pi[c]
            sd = wavefront._interp_shift(z, tf_j, margin)
            ld = wavefront._interp_shift(z, f32(longv) * tf_j, margin)
            outs += [sd, ld]
        return pi, pe, c1, outs

    def full_plan(sp, pv, seed):
        return wavefront.plan_spectral(sp, pv, arrays, controls, flags,
                                       consts, seed)

    def mk(fn, n_out):
        def run(sp, pv):
            res = jax.vmap(lambda a, b: fn(a, b))(sp, pv)
            tot = jnp.float32(0)
            leaves = jax.tree_util.tree_leaves(res)
            for l in leaves:
                tot += jnp.sum(jnp.abs(l.real)) + (
                    jnp.sum(jnp.abs(l.imag)) if jnp.iscomplexobj(l) else 0)
            return tot
        return jax.jit(run)

    rows = []
    for name, fn in [("inputs+energy", stage_inputs),
                     ("c1(cum)", stage_c1),
                     ("votes(cum)", stage_votes)]:
        dt, cs = timed(mk(fn, 0), spectra, prev)
        rows.append((name, dt))
        print(f"{name:14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)

    def plan_run(sp, pv):
        seeds = jnp.arange(batch)
        res = jax.vmap(lambda a, b, s: full_plan(a, b, s))(sp, pv, seeds)
        tot = jnp.float32(0)
        for l in jax.tree_util.tree_leaves(res):
            if jnp.iscomplexobj(l):
                tot += jnp.sum(jnp.abs(l.real)) + jnp.sum(jnp.abs(l.imag))
            else:
                tot += jnp.sum(jnp.abs(l))
        return tot
    dt, cs = timed(jax.jit(plan_run), spectra, prev)
    print(f"{'full plan':14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)

    # --- synthesis + OLA + assembly ----------------------------------------
    def synth_ola(sp, pv):
        out_specs = sp  # pretend sweep output = spectra
        blocks_t = stft.synthesize(out_specs, plan.basis)
        ring = engine._overlap_add(blocks_t, arrays["out_pos"],
                                   plan.sched.ring_len,
                                   plan.cfg.block_samples,
                                   plan.cfg.interval_samples)
        return jnp.sum(jnp.abs(ring))

    dt, cs = timed(jax.jit(lambda a, b: jnp.sum(jax.vmap(synth_ola)(a, b))),
                   spectra, prev)
    print(f"{'synth+ola':14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)

    # synthesis alone
    def synth_only(sp, pv):
        return jnp.sum(jnp.abs(stft.synthesize(sp, plan.basis)))
    dt, cs = timed(jax.jit(lambda a, b: jnp.sum(jax.vmap(synth_only)(a, b))),
                   spectra, prev)
    print(f"{'synth-only':14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)

    # analysis DFT alone on random frames
    frames = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (batch, nB, ch,
                                        plan.cfg.block_samples), jnp.float32)
    )(jax.random.PRNGKey(7)))

    def ana_only(fr):
        return jnp.sum(jnp.abs(stft.analyze(fr, plan.basis)))
    dt, cs = timed(jax.jit(lambda f: jnp.sum(jax.vmap(ana_only)(f))), frames)
    print(f"{'analyzeDFT':14s} {dt*1e3:8.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
