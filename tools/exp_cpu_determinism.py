#!/usr/bin/env python
"""Reproduce and isolate the XLA:CPU execution nondeterminism.

Renders the silence-test clip N times through ONE jitted executable and
counts bitwise mismatches vs the first call.  Env knobs let us bisect:
  SST_DET_N       calls (default 20)
  (set XLA_FLAGS / JAX_PLATFORMS / taskset externally)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from signalsmith_stretch_tpu.api import SignalsmithStretch

RATE = 8000


def main():
    n = int(os.environ.get("SST_DET_N", "20"))
    rng = np.random.default_rng(13)
    t = np.arange(2 * RATE) / RATE
    sig = np.where(t < 1.0, 0.0,
                   0.4 * np.sin(2 * np.pi * 330 * t)
                   + 0.01 * rng.standard_normal(t.size)).astype(np.float32)[None]
    out_len = int(sig.shape[1] * 1.25)
    s = SignalsmithStretch(seed=1)
    s.preset_cheaper(1, RATE, split_computation=False)
    base, ok = s.exact(sig, out_len)
    base = np.asarray(base)
    bad = 0
    for i in range(n - 1):
        out, ok = s.exact(sig, out_len)
        if not np.array_equal(base, np.asarray(out)):
            bad += 1
    import jax
    print(f"devices={len(jax.devices())} mismatches: {bad}/{n-1}  "
          f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}")


if __name__ == "__main__":
    main()
