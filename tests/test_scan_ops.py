"""Log-depth decay scans vs the reference's sequential bin sweeps.

Pins the C++ min/max selection semantics of ops/scan_ops._cpp_min/_cpp_max:
the formant envelope's inverse-decay pass (signalsmith-stretch.h:984-1007)
runs with decay = 1/0 = inf when the pitch estimate is 0 (all-silent metric),
so the sequential C++ computes inf*0 = NaN terms that std::min/std::max
silently DISCARD (NaN compares false).  jnp.minimum/jnp.maximum propagate
NaNs instead — simplifying these helpers back to jnp.minimum turned
silent-leading formant renders into all-NaN output (round-3 sweep FAILs).
"""
import numpy as np
import pytest

from conftest import rel_err_db, run_oracle
from signalsmith_stretch_tpu.api import SignalsmithStretch
from signalsmith_stretch_tpu.ops import scan_ops


def _seq_decay(x, init, decay, better):
    """Sequential y_b = cppop(x_b, decay*y_{b-1}) with C++ selection:
    std::min(a,b) = b<a ? b : a (keeps `a` when the product is NaN)."""
    y = np.empty_like(x)
    prev = np.float32(init)
    for i in range(x.size):
        t = np.float32(decay) * prev
        y[i] = t if better(t, x[i]) else x[i]
        prev = y[i]
    return y


@pytest.mark.parametrize("shift", ["0", "1"])
@pytest.mark.parametrize("direction", ["forward", "backward"])
def test_decay_scans_match_sequential(direction, shift, monkeypatch):
    monkeypatch.setenv("SST_SHIFT_SCAN", shift)
    rng = np.random.default_rng(3)
    x = rng.uniform(0.01, 2.0, size=257).astype(np.float32)
    init = np.float32(0.5)
    for decay, fn, better in (
            (np.float32(0.97),
             getattr(scan_ops, f"decay_max_{direction}"), np.greater),
            (np.float32(1.0 / 0.97),
             getattr(scan_ops, f"decay_min_{direction}"), np.less)):
        y, fin = fn(x, init, decay)
        y = np.asarray(y)
        ref = _seq_decay(x if direction == "forward" else x[::-1],
                         init, decay, better)
        if direction == "backward":
            ref = ref[::-1]
        np.testing.assert_allclose(y, ref, rtol=2e-6)
        assert float(fin) == y[-1 if direction == "forward" else 0]


@pytest.mark.parametrize("shift", ["0", "1"])
def test_decay_min_inf_decay_discards_nan(shift, monkeypatch):
    monkeypatch.setenv("SST_SHIFT_SCAN", shift)
    """decay = inf with zero envelope values: every inf*0 product is NaN and
    must be discarded exactly as std::min does (keep the other operand).
    The inf decay only ever pairs with an all-zero envelope (the pitch
    estimate is 0 exactly when the block is silent), so that is the case
    pinned here, across the init values a preceding pass can hand over."""
    x = np.zeros(64, np.float32)
    for init in (0.0, 1.5):
        for fn, better in ((scan_ops.decay_min_forward, np.less),
                           (scan_ops.decay_max_forward, np.greater)):
            y, fin = fn(x, np.float32(init), np.float32(np.inf))
            y = np.asarray(y)
            ref = _seq_decay(x, init, np.inf, better)
            assert not np.isnan(y).any(), (fn.__name__, init)
            if better is np.less:
                # min path: inf*init is either discarded (NaN) or loses
                np.testing.assert_array_equal(y, ref)
                assert float(fin) == 0.0


def test_silent_leading_formant_render_nan_free(oracle_bin, tmp_path):
    """Silent-leading clip through a formant-compensated +4st transpose: the
    all-silent leading blocks drive the pitch estimate to 0 and the formant
    inverse-decay to inf — the render must stay NaN-free and track the
    oracle (round-3 sweep FAIL: all-NaN output before _cpp_min/_cpp_max)."""
    from signalsmith_stretch_tpu.utils.evaluation import synth_clip
    rate = 8000
    sig = synth_clip("silence_edges", rate, 2.0)
    out_len = sig.shape[1]
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, semitones=4.0,
                     formant_comp=True)
    s = SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, split_computation=False)
    s.set_transpose_semitones(4.0)
    s.set_formant_semitones(0.0, compensate_pitch=True)
    out, ok = s.exact(sig, out_len)
    out = np.asarray(out)
    assert ok
    assert not np.isnan(out).any()
    # mapped render: gate the broadband envelope, not samples
    from signalsmith_stretch_tpu.utils.evaluation import envelope_db
    dev = envelope_db(out, ref, rate)
    assert dev < 1.0, f"envelope deviation {dev:.2f} dB"


@pytest.mark.parametrize("perrow", [False, True])
def test_shift_scan_matches_associative(perrow, monkeypatch):
    """The TPU Hillis-Steele shift scans (SST_SHIFT_SCAN=1, round 5) agree
    with the associative forms the probes were gated on: same sums/selections
    reassociated (closed-form level coefficients via repeated squaring)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    x = rng.uniform(0.001, 2.0, size=(6, 512)).astype(np.float32)
    init = np.float32(0.25)
    decay = (rng.uniform(0.9, 0.999, size=6).astype(np.float32)
             if perrow else np.float32(0.97))
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SST_SHIFT_SCAN", mode)
        y1, f1_ = scan_ops.iir_forward(jnp.asarray(x), np.float32(0.1),
                                       np.float32(0.13))
        y2, f2_ = scan_ops.decay_max_forward(jnp.asarray(x), init, decay)
        y3, f3_ = scan_ops.decay_min_backward(jnp.asarray(x), init,
                                              np.float32(1.0) / decay)
        outs[mode] = [np.asarray(v) for v in (y1, f1_, y2, f2_, y3, f3_)]
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_allclose(a, b, rtol=4e-6, atol=1e-7)


@pytest.mark.parametrize("shift", ["0", "1"])
def test_segmented_run_sums_shift_matches(shift, monkeypatch):
    """ops/interp._segmented_run_sums: the TPU Hillis-Steele shift form vs
    the associative form vs a numpy sequential reference."""
    import jax.numpy as jnp
    from signalsmith_stretch_tpu.ops.interp import _segmented_run_sums
    monkeypatch.setenv("SST_SHIFT_SCAN", shift)
    rng = np.random.default_rng(4)
    B = 300
    above = rng.uniform(size=(5, B)) < 0.55
    data = rng.uniform(0.1, 1.0, size=(5, B)).astype(np.float32) * above
    start = above & np.concatenate(
        [np.ones((5, 1), bool), ~above[:, :-1]], axis=1)
    got = np.asarray(_segmented_run_sums(jnp.asarray(data),
                                         jnp.asarray(start),
                                         jnp.asarray(above)))
    # sequential reference
    ref = np.zeros_like(data)
    for r in range(5):
        i = 0
        while i < B:
            if not above[r, i]:
                i += 1
                continue
            j = i
            while j < B and above[r, j] and not (j > i and start[r, j]):
                j += 1
            tot = np.float32(data[r, i:j].sum(dtype=np.float64))
            ref[r, i:j] = tot
            i = j
    mask = above
    np.testing.assert_allclose(got[mask], ref[mask], rtol=3e-6)
