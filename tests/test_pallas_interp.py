"""Pallas windowed interpolation vs the XLA windowed path.

Runs the Mosaic kernel in INTERPRETER mode on CPU (unlike the sweep
kernel's out-block revisit pattern, every grid step here writes its full
output block, which the interpreter models faithfully) and pins bit
equality of all tap/lerp outputs and the violation count against
wavefront.interp_planes_window_multi."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signalsmith_stretch_tpu import wavefront
from signalsmith_stretch_tpu.ops.pallas import interp as pallas_interp


def test_pallas_interp_matches_windowed(monkeypatch):
    monkeypatch.setenv("SST_PALLAS_INTERP", "1")     # interpreter mode
    monkeypatch.setenv("SST_INTERP_IMPL", "xla")     # reference path below
    rng = np.random.default_rng(0)
    nB, n, W0, B = 4, 4, 512, 256
    C, L = 64, 128
    planes = jnp.asarray(rng.standard_normal((nB, n, W0)).astype(np.float32))
    base = (np.cumsum(rng.uniform(0.2, 2.0, (nB, B)), axis=1)
            .astype(np.float32) - 20)                # some positions < 0
    sets = [(jnp.asarray(base), 3, False),
            (jnp.asarray(base * 0.9 + 3.7), 4, True),
            (jnp.asarray(base * 1.1 - 2.0), 2, False)]
    ref, bad_ref = wavefront.interp_planes_window_multi(planes, sets, C, L)
    got, bad_got = pallas_interp.interp_multi(planes, sets, L)
    assert int(bad_ref) == 0 and int(bad_got) == 0
    for k, (r, g) in enumerate(zip(ref, got)):
        r = r if isinstance(r, tuple) else (r,)
        g = g if isinstance(g, tuple) else (g,)
        for a, b in zip(r, g):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                          err_msg=f"set {k}")
