#!/usr/bin/env python
"""Production-path attribution of the MAPPED pair planner at bench shapes.

Unlike profile_mapped.py (complex spectra — the CPU-parity path) and the
votes/prelim prefixes (which re-run the shared interp multi per prefix,
double-counting it), this times the REAL pair plan_spectral as production
jits it, plus two honest sub-jits:

  peaks-only   smoothing + peaks/output map -> input_bin checksum
  plan-full    plan_spectral (pair) -> SweepInputs checksums
  plan-novote  plan with the vote coefficients replaced by pi (values are
               WRONG — pure ablation: full minus this isolates the vote
               products + interp vote sets)
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

from signalsmith_stretch_tpu import planner, spectral
from signalsmith_stretch_tpu.models import StretchModel
from signalsmith_stretch_tpu.ops import scan_ops
from signalsmith_stretch_tpu.ops.interp import _peaks_and_map_batched
from tputime import timed

f32 = np.float32


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    model = StretchModel.build(channels=2, sample_rate=48000,
                               in_samples=480000, out_samples=480000,
                               semitones=12, tonality_hz=8000)
    plan = model.plan
    consts = plan.consts
    controls, flags = model.controls, model.flags
    nB = len(plan.arrays["new_spectrum"])
    B = consts.bands
    ch = 2
    print(f"shapes: batch={batch} nB={nB} B={B}", flush=True)

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (4, batch, nB, ch, B), jnp.float32)

    planes = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    sp = (planes[0], planes[1])
    pv = (planes[2], planes[3])

    def peaks_only(s0, s1):
        def one(sr, si):
            energy = jnp.sum(sr * sr + si * si, axis=1)     # [nB, B]
            sm = energy
            e = jnp.zeros(nB, jnp.float32)
            for _ in range(2):
                sm, e = scan_ops.iir_backward(sm, e, f32(consts.slew))
                sm, e = scan_ops.iir_forward(sm, e, f32(consts.slew))
            ib, fg, _ = _peaks_and_map_batched(energy, sm, controls, flags,
                                               consts, (64, 128))
            return jnp.sum(ib) + jnp.sum(fg)
        return jnp.sum(jax.vmap(one)(s0, s1))

    def plan_full(s0, s1, p0, p1):
        def one(sr, si, pr, pi_):
            out = planner.plan_spectral((sr, si), (pr, pi_), plan.arrays,
                                        controls, flags, consts, 0)
            tot = jnp.float32(0)
            for z in (out.a1, out.a2, out.d1, out.d2):
                tot += jnp.sum(jnp.abs(z[0])) + jnp.sum(jnp.abs(z[1]))
            for c in range(ch):
                tot += jnp.sum(out.pe[c]) + jnp.sum(jnp.abs(out.pi[c][0]))
            return tot
        return jnp.sum(jax.vmap(one)(s0, s1, p0, p1))

    for name, fn, args in [
            ("peaks-only", peaks_only, (sp[0], sp[1])),
            ("plan-full ", plan_full, (sp[0], sp[1], pv[0], pv[1]))]:
        dt, cs = timed(jax.jit(fn), *args)
        print(f"{name} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
