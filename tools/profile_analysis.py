#!/usr/bin/env python
"""Sub-stage timing of the ANALYSIS stage at bench shapes: timeline build,
frame gather (main+re combined), window mul, matmul DFT — each as a jitted
prefix under the same vmap-over-batch the engine uses."""
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
    clips = jnp.asarray(make_corpus(batch, 2, in_len, rate))
    block = plan.cfg.block_samples
    all_idx = np.concatenate([plan.frame_idx, plan.re_frame_idx], axis=0)
    print("frames per clip:", all_idx.shape, "block:", block,
          "fft:", plan.basis.fft_samples, flush=True)

    def v(f):
        return jax.jit(lambda a: jnp.sum(jax.vmap(f)(a)))

    f_timeline = v(lambda a: jnp.sum(engine._build_timeline(a, plan)))

    def gather(a):
        tl = engine._build_timeline(a, plan)
        return jnp.sum(engine.gather_frames(tl, all_idx, block))

    def windowed(a):
        tl = engine._build_timeline(a, plan)
        fr = engine.gather_frames(tl, all_idx, block)
        return jnp.sum(fr * jnp.asarray(plan.basis.window))

    def full(a):
        s, p = engine.analyze_stage(a, plan)
        return jnp.sum(jnp.abs(s)) + jnp.sum(jnp.abs(p))

    for name, f in [("timeline", f_timeline), ("`+gather", v(gather)),
                    ("+window", v(windowed)), ("+dft(anal.)", v(full))]:
        dt, cs = timed(f, clips)
        print(f"{name:12s} {dt*1e3:9.1f} ms  (compile {cs:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
