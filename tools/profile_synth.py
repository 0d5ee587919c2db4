#!/usr/bin/env python
"""Sub-stage timing of the SYNTHESIS stage at bench shapes: inverse FFT,
overlap-add, WOLA normalization/assembly, silence-bypass selects.

All prefixes consume a precomputed [ch, nB, B] spectrum batch so the sweep
cost stays out of the measurement.
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

from signalsmith_stretch_tpu import engine, stft
from signalsmith_stretch_tpu.models import StretchModel
from bench import make_corpus


from tputime import timed  # noqa: E402  (floor-corrected; tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    rate = 48000
    in_len = int(rate * 10.0)
    out_len = int(round(in_len * 1.25))
    model = StretchModel.build(channels=2, sample_rate=rate,
                               in_samples=in_len, out_samples=out_len)
    plan = model.plan
    sch, cfg = plan.sched, plan.cfg
    clips = jnp.asarray(make_corpus(batch, 2, in_len, rate))
    nB = plan.frame_idx.shape[0]
    rng = np.random.default_rng(0)
    spec_r = jnp.asarray(rng.standard_normal(
        (batch, 2, nB, plan.basis.bands)).astype(np.float32))
    spec_i = jnp.asarray(rng.standard_normal(
        (batch, 2, nB, plan.basis.bands)).astype(np.float32))

    def v(f, *extra):
        return jax.jit(lambda *a: jnp.sum(jax.vmap(f)(*a)))

    def mk_spec(sr, si):
        return jax.lax.complex(sr, si)

    f_ifft = v(lambda sr, si: jnp.sum(jnp.abs(
        stft.synthesize(mk_spec(sr, si), plan.basis))))

    def ola(sr, si):
        bt = stft.synthesize(mk_spec(sr, si), plan.basis)
        ring = engine._overlap_add(bt, plan.arrays["out_pos"], sch.ring_len,
                                   cfg.block_samples, cfg.interval_samples)
        return jnp.sum(jnp.abs(ring))

    def full_nosil(sr, si):
        out = engine.synthesis_stage((sr, si), plan, audio=None)
        return jnp.sum(jnp.abs(out))

    def full_sil(sr, si, a):
        out = engine.synthesis_stage((sr, si), plan, audio=a)
        return jnp.sum(jnp.abs(out))

    rows = []
    for name, f, args in [
            ("ifft", f_ifft, (spec_r, spec_i)),
            ("+ola", v(ola), (spec_r, spec_i)),
            ("+assembly", v(full_nosil), (spec_r, spec_i)),
            ("+silence", v(full_sil), (spec_r, spec_i, clips))]:
        dt, cs = timed(f, *args)
        rows.append((name, dt))
        print(f"{name:12s} {dt*1e3:9.1f} ms  (compile {cs:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
