"""Fused Pallas sweep (ops/pallas/sweep.py) vs the XLA scan path.

The kernel only lowers on real TPU hardware (Mosaic); the CPU suite skips
it and the parity evidence lives in tools/exp_pallas_sweep.py runs +
cli_dev's golden gate on the chip.  Pair cell, pe_from_pi, ch=2 — the
headline configuration the kernel covers (see sweep.supported)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signalsmith_stretch_tpu import wavefront

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Mosaic kernel needs real TPU; parity via tools/exp_pallas_sweep")


def test_pallas_sweep_matches_xla(monkeypatch):
    rng = np.random.default_rng(3)
    ch, longv, K = 2, 6, 32
    bands = 512                       # one emission epoch
    nB = 128                          # one row group

    def c64(shape):
        return (rng.standard_normal(shape) +
                1j * rng.standard_normal(shape)).astype(np.complex64)

    pi = tuple(jnp.asarray(c64((nB, bands))) for _ in range(ch))
    pe = tuple(p.real ** 2 + p.imag ** 2 for p in pi)
    inp = wavefront.SweepInputs(
        a1=jnp.asarray(c64((nB, bands))), a2=jnp.asarray(c64((nB, bands))),
        d1=jnp.asarray(c64((nB, bands))), d2=jnp.asarray(c64((nB, bands))),
        mc=jnp.zeros((nB, bands), jnp.int32), pe=pe, pi=pi)

    def run():
        jax.clear_caches()
        wavefront._sweep_unskew_fn.cache_clear()
        fn = wavefront._sweep_unskew_fn(longv, ch, True, bands, K)
        return np.asarray(jax.jit(fn)(inp))

    monkeypatch.setenv("SST_SWEEP_PAIR", "1")
    monkeypatch.setenv("SST_SWEEP_IMPL", "xla")
    ref = run()
    monkeypatch.setenv("SST_SWEEP_IMPL", "pallas")
    monkeypatch.setenv("SST_PALLAS_BT", "1")
    got = run()
    np.testing.assert_array_equal(got, ref)
