"""Wavefront engine: skew algebra + equivalence with the per-block scan."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import signalsmith_stretch_tpu as sst
from signalsmith_stretch_tpu import wavefront

from conftest import rel_err_db


def test_skew_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((9, 31, 2)).astype(np.float32))
    for step in (1, 3, 7):
        s = wavefront.skew(x, step)
        assert s.shape == (9, 31 + 8 * step, 2)
        for k in (0, 4, 8):
            np.testing.assert_array_equal(
                np.asarray(s[k, k * step:k * step + 31]), np.asarray(x[k]))
        y = wavefront.unskew(s, step, 31)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def _render(sig, rate, mode, **kw):
    os.environ["SST_ENGINE"] = mode
    try:
        s = sst.SignalsmithStretch(seed=1)
        s.preset_cheaper(sig.shape[0], rate, False)
        s.set_transpose_semitones(kw.get("semis", 0.0),
                                  kw.get("tonality", 0.0) / rate)
        s.set_formant_semitones(kw.get("formant", 0.0), kw.get("fcomp", False))
        out, ok = s.exact(sig, int(round(sig.shape[1] * kw.get("time", 1.0))))
        assert ok
        return out
    finally:
        os.environ.pop("SST_ENGINE", None)


@pytest.mark.parametrize("case,gate", [
    (dict(), -100),                              # identity: recursion stable
    (dict(formant=3), -100),                     # formants: stable
    (dict(time=1.25), -60),                      # stretch: mild chaos
    (dict(semis=5, tonality=2000), -25),         # mapped: chaos floor
])
def test_wavefront_matches_scan(test_signal, case, gate):
    sig, rate = test_signal
    a = _render(sig, rate, "scan", **case)
    b = _render(sig, rate, "wavefront", **case)
    db = rel_err_db(b, a)
    assert db < gate, (db, gate)
