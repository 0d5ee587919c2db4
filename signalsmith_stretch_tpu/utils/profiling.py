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
