#!/usr/bin/env python
"""Stage-cost breakdown for the headline config on the attached TPU.

Builds jitted prefixes of the exact() pipeline (analysis -> plan -> sweep ->
full render) and reports cumulative + per-stage wall time so optimization
effort lands where the time is.  Timing follows bench.py: checksum + float()
sync, min over reps.
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
from signalsmith_stretch_tpu.models import StretchModel
from bench import make_corpus


def timed(fn, *args, reps=3):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), compile_s


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
    model = StretchModel.build(channels=2, sample_rate=rate,
                               in_samples=in_len, out_samples=out_len, **kw)
    plan = model.plan
    clips = jnp.asarray(make_corpus(batch, 2, in_len, rate))
    seeds = jnp.arange(batch, dtype=jnp.int32)

    def analysis_one(audio):
        timeline = engine._build_timeline(audio, plan)
        gather = engine.__dict__  # use the inner helper via render path? no:
        raise SystemExit("unused")

    # Reuse render_exact structure by monkey-patching stop points is fragile;
    # instead, inline the stages exactly as engine.render_exact does.
    cfg, sch = plan.cfg, plan.sched
    block = cfg.block_samples

    def stage_analysis(audio):
        timeline = engine._build_timeline(audio, plan)
        ch_n = timeline.shape[0]
        frames = _gather_frames(timeline, plan.frame_idx, block, ch_n)
        spectra = stft.analyze(frames, plan.basis)
        if len(plan.re_rows):
            re_f = _gather_frames(timeline, plan.re_frame_idx, block, ch_n)
            re_spec = stft.analyze(re_f, plan.basis)
            prev = (jnp.zeros_like(spectra)
                    .at[jnp.asarray(plan.re_rows)].set(re_spec))
        else:
            prev = jnp.zeros_like(spectra)
        return spectra, prev

    # copy of engine's inner gather_frames (it is a closure there)
    def _gather_frames(timeline, idx, block, ch_n):
        starts = [int(s) for s in idx[:, 0]]
        n = len(starts)
        pieces = []
        k = 0
        while k < n:
            s0 = starts[k]
            j = k + 1
            stride = 0
            if s0 >= 0:
                while j < n:
                    d = starts[j] - starts[j - 1]
                    if d <= 0 or (stride and d != stride):
                        break
                    stride = d
                    j += 1
            run = j - k
            if run >= 8 and stride > 0:
                m = -(-block // stride) + 1
                need = (run + m - 1) * stride
                seg = timeline[:, s0:s0 + need]
                short = need - seg.shape[1]
                if short > 0:
                    seg = jnp.concatenate(
                        [seg, jnp.zeros((ch_n, short), jnp.float32)], axis=1)
                M = seg.reshape(ch_n, run + m - 1, stride)
                win = jnp.concatenate([M[:, i:i + run] for i in range(m)],
                                      axis=-1)[:, :, :block]
                pieces.append(jnp.moveaxis(win, 0, 1))
                k = j
            else:
                if s0 >= 0:
                    row = timeline[:, s0:s0 + block]
                else:
                    pad = jnp.zeros((ch_n, -s0), jnp.float32)
                    row = jnp.concatenate([pad, timeline[:, 0:block + s0]], 1)
                pieces.append(row[None])
                k += 1
        return jnp.concatenate(pieces, axis=0)

    def stage_plan(audio, seed):
        spectra, prev = stage_analysis(audio)
        inputs = wavefront.plan_spectral(spectra, prev, plan.arrays,
                                         model.controls, model.flags,
                                         plan.consts, seed)
        tot = 0.0
        for x in (inputs.a1, inputs.a2, inputs.d1, inputs.d2):
            tot += jnp.sum(jnp.abs(x.real)) + jnp.sum(jnp.abs(x.imag))
        for x in inputs.pe + inputs.pi:
            tot += jnp.sum(jnp.abs(x))
        return tot

    def stage_sweep(audio, seed):
        spectra, prev = stage_analysis(audio)
        out = wavefront.spectral_all_blocks(spectra, prev, plan.arrays,
                                            model.controls, model.flags,
                                            plan.consts, seed)
        return jnp.sum(jnp.abs(out))

    def stage_synth_only(audio, seed):
        spectra, prev = stage_analysis(audio)
        blocks_t = stft.synthesize(spectra, plan.basis)
        return jnp.sum(jnp.abs(blocks_t))

    f_ana = jax.jit(jax.vmap(lambda a: sum(jnp.sum(jnp.abs(s))
                                           for s in stage_analysis(a))))
    f_plan = jax.jit(jax.vmap(stage_plan))
    f_sweep = jax.jit(jax.vmap(stage_sweep))
    f_synth = jax.jit(jax.vmap(stage_synth_only))

    def full(x, s):
        return jnp.sum(jnp.abs(model.batched(x, s)))
    f_full = jax.jit(full)

    rows = []
    for name, fn, args in [
        ("analysis", lambda x, s: jnp.sum(f_ana(x)), (clips, seeds)),
        ("plan(cum)", lambda x, s: jnp.sum(f_plan(x, s)), (clips, seeds)),
        ("sweep(cum)", lambda x, s: jnp.sum(f_sweep(x, s)), (clips, seeds)),
        ("ana+synthFFT", lambda x, s: jnp.sum(f_synth(x, s)), (clips, seeds)),
        ("full", f_full, (clips, seeds)),
    ]:
        dt, cs = timed(fn, *args)
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
