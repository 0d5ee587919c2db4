#!/usr/bin/env python
"""Stage-cost breakdown for the headline config on the attached TPU.

Builds jitted prefixes of the exact() pipeline (analysis -> plan -> sweep ->
full render) via engine.{analyze,spectral,synthesis}_stage and reports
cumulative + per-stage wall time so optimization effort lands where the time
is.  Timing follows bench.py: checksum + float() sync, min over reps.
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

from signalsmith_stretch_tpu import engine, stft, wavefront
from signalsmith_stretch_tpu.models import StretchModel
from signalsmith_stretch_tpu.utils.profiling import stage_fns
from bench import make_corpus


from tputime import timed  # noqa: E402  (floor-corrected; see tools/tputime.py)


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    rate = 48000
    seconds = 10.0
    in_len = int(rate * seconds)
    tf = float(os.environ.get("SST_PROF_TIMEFACTOR", "1.25"))
    out_len = int(round(in_len * tf))
    kw = {}
    if os.environ.get("SST_PROF_MAPPED") == "1":
        kw = dict(semitones=12, tonality_hz=8000)
    if os.environ.get("SST_PROF_FORMANT") == "1":
        kw = dict(formant_semitones=3, formant_compensation=True,
                  formant_base_hz=220)
    model = StretchModel.build(channels=2, sample_rate=rate,
                               in_samples=in_len, out_samples=out_len, **kw)
    clips = jnp.asarray(make_corpus(batch, 2, in_len, rate))
    seeds = jnp.arange(batch, dtype=jnp.int32)

    fns = stage_fns(model)
    rows = []
    for name in ("analysis", "plan(cum)", "sweep(cum)", "ana+synthFFT",
                 "full"):
        dt, cs = timed(fns[name], clips, seeds)
        rows.append((name, dt, cs))
        print(f"{name:14s} {dt*1e3:9.1f} ms   (compile {cs:.1f}s)", flush=True)

    d = dict((n, t) for n, t, _ in rows)
    print(f"\nderived:")
    print(f"  plan-only   {1e3*(d['plan(cum)'] - d['analysis']):9.1f} ms")
    print(f"  sweep-only  {1e3*(d['sweep(cum)'] - d['plan(cum)']):9.1f} ms")
    print(f"  synthFFT    {1e3*(d['ana+synthFFT'] - d['analysis']):9.1f} ms")
    print(f"  ola+norm    {1e3*(d['full'] - d['sweep(cum)'] - (d['ana+synthFFT'] - d['analysis'])):9.1f} ms")


if __name__ == "__main__":
    main()
