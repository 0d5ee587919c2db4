"""Profiling utilities: trustworthy timing, stage breakdowns, SVG reports.

The reference's dev harness wraps each processing step in stopwatches and
renders an SVG (cmd/main-dev.cpp:165-208, SURVEY.md §5).  The TPU equivalents:

  - `timed()` — honest wall timing around a jitted call (syncs via a device
    scalar; `block_until_ready` alone is unreliable on relay-attached TPUs)
  - `stage_times()` — per-stage breakdown by timing a dict of closures
  - `write_svg_bars()` — dependency-free SVG bar chart (profile.svg analogue)
  - `trace()` — context manager around jax.profiler for deep dives
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def sync(value) -> float:
    """Force completion of `value` (a jittable array) and return a checksum."""
    return float(jnp.sum(jnp.abs(value)))


def timed(fn: Callable, *args, reps: int = 3, warmup: int = 1) -> float:
    """Best-of-reps wall time (seconds) of fn(*args) with device sync."""
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def stage_times(stages: Dict[str, Callable], reps: int = 3) -> Dict[str, float]:
    """Time a dict of closures; returns {name: seconds}."""
    return {name: timed(fn, reps=reps) for name, fn in stages.items()}


def write_svg_bars(path: str, values: Dict[str, float], unit: str = "ms",
                   title: str = "stage timing"):
    """Minimal SVG horizontal bar chart (the profile.svg analogue)."""
    width, row, pad = 640, 26, 140
    items = list(values.items())
    height = row * len(items) + 50
    vmax = max(values.values()) or 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">',
        f'<text x="8" y="18" font-size="14">{title}</text>',
    ]
    for i, (name, v) in enumerate(items):
        y = 36 + i * row
        w = int((width - pad - 80) * v / vmax)
        parts.append(f'<text x="8" y="{y + 13}">{name[:20]}</text>')
        parts.append(f'<rect x="{pad}" y="{y}" width="{max(w, 1)}" '
                     f'height="{row - 8}" fill="#4a90d9"/>')
        parts.append(f'<text x="{pad + w + 6}" y="{y + 13}">'
                     f'{v:.2f} {unit}</text>')
    parts.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(parts))


def stage_fns(model) -> Dict[str, Callable]:
    """Jitted cumulative-prefix checksums of the exact() pipeline for a
    StretchModel: analysis -> +plan -> +sweep -> analysis+synthesisFFT ->
    full render.  Each fn maps (clips [batch, ch, in], seeds [batch]) to a
    device scalar (so `float()` is an honest sync; cmd/main-dev.cpp:165-208
    is the per-step stopwatch this replaces).  Cumulative prefixes rather
    than isolated stages: XLA fuses across stage boundaries, so only
    differences of end-to-end prefixes are honest."""
    from .. import engine, stft, wavefront

    plan, controls, flags = model.plan, model.controls, model.flags
    # mirror render_exact's spectra-flow decision (engine.py): prefixes must
    # run the SAME planner variant production runs (the pair tail on TPU) —
    # the round-4 prefixes fed complex spectra and timed the complex planner
    pair = (os.environ.get("SST_SPECTRA_PAIR") or
            ("1" if jax.default_backend() != "cpu" else "0")) == "1"
    pair = pair and os.environ.get("SST_ENGINE", "wavefront") == "wavefront"

    def _cs(x):
        """checksum of a complex array, an f32 plane, or an (re, im) pair."""
        if isinstance(x, tuple):
            return sum(jnp.sum(jnp.abs(v)) for v in x)
        if jnp.iscomplexobj(x):
            return jnp.sum(jnp.abs(x.real)) + jnp.sum(jnp.abs(x.imag))
        return jnp.sum(jnp.abs(x))

    def ana(a):
        s, p = engine.analyze_stage(a, plan, pair=pair)
        return _cs(s) + _cs(p)

    def plan_cum(a, seed):
        s, p = engine.analyze_stage(a, plan, pair=pair)
        inputs = wavefront.plan_spectral(s, p, plan.arrays, controls, flags,
                                         plan.consts, seed)
        tot = 0.0
        for x in (inputs.a1, inputs.a2, inputs.d1, inputs.d2):
            tot += _cs(x)
        for x in inputs.pe + inputs.pi:
            tot += _cs(x)
        return tot

    def sweep_cum(a, seed):
        s, p = engine.analyze_stage(a, plan, pair=pair)
        sr, si = engine.spectral_stage(s, p, plan, controls, flags, seed)
        return jnp.sum(jnp.abs(sr)) + jnp.sum(jnp.abs(si))

    def ana_synth(a, seed):
        s, p = engine.analyze_stage(a, plan, pair=pair)
        if pair:
            return jnp.sum(jnp.abs(stft.synthesize_pair(s[0], s[1],
                                                        plan.basis)))
        return jnp.sum(jnp.abs(stft.synthesize(s, plan.basis)))

    return {
        "analysis": jax.jit(lambda x, s: jnp.sum(jax.vmap(ana)(x))),
        "plan(cum)": jax.jit(lambda x, s: jnp.sum(jax.vmap(plan_cum)(x, s))),
        "sweep(cum)": jax.jit(lambda x, s: jnp.sum(jax.vmap(sweep_cum)(x, s))),
        "ana+synthFFT": jax.jit(lambda x, s: jnp.sum(jax.vmap(ana_synth)(x, s))),
        "full": jax.jit(lambda x, s: jnp.sum(jnp.abs(model.batched(x, s)))),
    }


def stage_breakdown(model, clips, seeds, reps: int = 3) -> Dict[str, float]:
    """Per-stage seconds for one model at the given batch: analysis /
    plan / sweep / synthesisFFT / OLA+assembly, derived from cumulative
    prefix timings (see stage_fns)."""
    fns = stage_fns(model)
    cum = {name: timed(fn, clips, seeds, reps=reps)
           for name, fn in fns.items()}
    synth_fft = max(0.0, cum["ana+synthFFT"] - cum["analysis"])
    return {
        "analysis": cum["analysis"],
        "plan": max(0.0, cum["plan(cum)"] - cum["analysis"]),
        "sweep": max(0.0, cum["sweep(cum)"] - cum["plan(cum)"]),
        "synthesisFFT": synth_fft,
        "OLA+assembly": max(0.0, cum["full"] - cum["sweep(cum)"] - synth_fft),
        "full": cum["full"],
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RetraceGuard:
    """The 'no allocations in the audio path' analogue (cmd/main-dev.cpp:160):
    asserts that a jitted function does not re-trace across calls."""

    def __init__(self, fn):
        self._fn = fn
        self.traces = 0

        def counting(*args, **kwargs):
            self.traces += 1
            return fn(*args, **kwargs)

        self.jitted = jax.jit(counting)

    def check(self, max_traces: int = 1):
        if self.traces > max_traces:
            raise RuntimeError(
                f"hot path re-traced {self.traces} times (> {max_traces}); "
                "a shape or static argument is changing per call")
