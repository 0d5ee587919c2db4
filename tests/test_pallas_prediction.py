"""Pallas main-prediction sweep kernel vs the lax.scan reference.

The kernel is disabled by default in this environment (relay-bound Mosaic
DMA, spectral._run_sweep), but it must not rot: the interpreter runs it on
CPU and pins bit-level agreement with the scan formulation it mirrors
(signalsmith-stretch.h:722-803 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signalsmith_stretch_tpu import spectral
from signalsmith_stretch_tpu.ops.pallas.prediction import main_prediction_sweep


@pytest.mark.parametrize("ch,longv,n,B", [(2, 6, 5, 256), (1, 4, 3, 128)])
def test_pallas_kernel_matches_scan(ch, longv, n, B):
    rng = np.random.default_rng(41)

    def c64(*shape):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    st, lt, pu, pi_m = (jnp.asarray(c64(n, B)) for _ in range(4))
    pe_m = jnp.asarray((rng.standard_normal((n, B)) ** 2).astype(np.float32))
    mc = jnp.asarray(rng.integers(0, ch, (n, B)).astype(np.int32))
    ct = jnp.asarray(c64(ch, n, B))
    pe_all = jnp.asarray((rng.standard_normal((ch, n, B)) ** 2)
                         .astype(np.float32))
    pi_all = jnp.asarray(c64(ch, n, B))

    got = main_prediction_sweep(st, lt, pu, pe_m, pi_m, mc, ct, pe_all,
                                pi_all, ch=ch, longv=longv, interpret=True)

    def one(i):
        return spectral._sweep_scan(st[i], lt[i], pu[i], pe_m[i], pi_m[i],
                                    mc[i], ct[:, i], pe_all[:, i],
                                    pi_all[:, i], ch=ch, longv=longv)

    want = jnp.stack([one(i) for i in range(n)], axis=1)   # [ch, n, B]
    g, w = np.asarray(got), np.asarray(want)
    err = np.abs(g - w)
    # the interpreter's float contraction differs from the scan's by ~1 ulp
    # per op, and the cross-channel-locked recurrence amplifies over the bin
    # sweep (same chaos as docs/PARITY.md); on real TPU hardware the kernel
    # measured bit-exact vs the scan
    assert err.max() <= 1e-4 * (1 + np.abs(w).max()), err.max()
