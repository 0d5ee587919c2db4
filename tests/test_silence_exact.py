"""exact() silence bypass parity (signalsmith-stretch.h:240-278).

In exact() the bypass can fire in two places (the counter starts at 0 after
reset, :56):
  - the *flush* zero-input process bypasses whenever the main segment was
    silent and the counter crossed 2*block — so every silent render's flush
    region is hard zeros, not a spectral render of tiny values;
  - the *main* process bypasses only under heavy compression
    (surplus = rate*outputLatency >= 2*block, i.e. rate >= ~4): output is a
    wraparound passthrough of the (sub-noisefloor) input, and the tail is
    read at an un-advanced head from a ring the main/flush blocks never
    touched.

Inputs within ~1 ulp of the 1e-15 noise floor may branch differently between
the C++ sequential float32 accumulation and the JAX tree reduction — tests
use clearly-silent / clearly-loud clips (docs/PARITY.md).
"""
import numpy as np
import pytest

from conftest import rel_err_db, run_oracle
from signalsmith_stretch_tpu.api import SignalsmithStretch


RATE = 8000


def _render(sig, out_len, seed=1):
    s = SignalsmithStretch(seed=seed)
    # split=False to match run_oracle's default (no --split): the silence
    # bypass regions are keyed to the latency geometry, which split shifts
    s.preset_cheaper(1, RATE, split_computation=False)
    out, ok = s.exact(sig, out_len)
    assert ok
    return np.asarray(out), s


def test_all_zero_clip_renders_all_zero(oracle_bin, tmp_path):
    sig = np.zeros((1, 2 * RATE), np.float32)
    out_len = int(sig.shape[1] * 1.25)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, RATE, time_f=1.25)
    out, _ = _render(sig, out_len)
    assert out.shape == ref.shape
    assert not ref.any()
    assert not out.any()


def test_subnoise_clip_flush_bypass(oracle_bin, tmp_path):
    """amp ~1e-10 noise: total energy ~1.3e-16 < 1e-15.  At 1.25x stretch the
    main process runs normally (surplus < 2*block) but the flush zero-input
    process bypasses: its region must be EXACT zeros in both engines, and the
    whole render must still track the oracle."""
    rng = np.random.default_rng(11)
    sig = (1e-10 * rng.standard_normal((1, 2 * RATE))).astype(np.float32)
    out_len = int(sig.shape[1] * 1.25)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, RATE, time_f=1.25)
    out, s = _render(sig, out_len)

    plan = next(iter(s._plan_cache.values()))
    sch = plan.sched
    assert sch.surplus < 2 * s.block_samples()      # main bypass can't fire
    assert sch.flush_block_out > 0
    fz = slice(sch.main_out, sch.main_out + sch.flush_block_out)
    assert not ref[:, fz].any(), "oracle flush region not bypassed?"
    assert not out[:, fz].any()
    # outside the flush region both are tiny spectral renders of the same
    # tiny input; gate relative (scale-invariant)
    assert rel_err_db(out[:, :sch.main_out], ref[:, :sch.main_out]) < -60


def test_subnoise_clip_main_bypass_passthrough(oracle_bin, tmp_path):
    """5x compression (time 0.2): surplus = 5*outputLatency >= 2*block, so a
    silent main segment is emitted as a wraparound passthrough of the input —
    bit-exact copies on both sides — and the tail comes from the un-advanced
    head."""
    rng = np.random.default_rng(12)
    sig = (1e-10 * rng.standard_normal((1, 4 * RATE))).astype(np.float32)
    out_len = int(sig.shape[1] * 0.2)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, RATE, time_f=0.2)
    out, s = _render(sig, out_len)

    plan = next(iter(s._plan_cache.values()))
    sch = plan.sched
    assert sch.surplus >= 2 * s.block_samples()
    # passthrough region: outputs[i] = inputs[seekLength + i % mainIn]
    expect = sig[:, sch.seek_length
                 + (np.arange(sch.main_out) % sch.main_in)]
    np.testing.assert_array_equal(out[:, :sch.main_out], expect)
    np.testing.assert_array_equal(ref[:, :sch.main_out], expect)
    # flush region zeros; tail residue matches the oracle exactly at this
    # amplitude scale (both read the same preroll-only ring)
    fz = slice(sch.main_out, sch.main_out + sch.flush_block_out)
    assert not out[:, fz].any() and not ref[:, fz].any()
    tail_o, tail_r = out[:, fz.stop:], ref[:, fz.stop:]
    assert tail_o.shape == tail_r.shape
    if tail_r.any() or tail_o.any():
        assert rel_err_db(tail_o, tail_r) < -60


def test_partial_silence_keeps_normal_path(oracle_bin, tmp_path,
                                           fresh_compile_cache):
    """exact() scans the WHOLE main segment: one loud region disables the
    bypass for the whole render, so output must equal the SST_SILENCE=0
    render bit-for-bit and track the oracle.

    Both renders go through ONE engine instance: the silence enable is a
    runtime argument of one compiled executable (engine.jitted_render), so
    bit-equality is exact by construction.  Comparing across separately
    compiled instances is NOT valid — XLA CPU's fma contraction varies
    compile-to-compile even for identical programs (measured ~1e-5,
    amplified by the phase recursion; docs/PARITY.md)."""
    rng = np.random.default_rng(13)
    t = np.arange(2 * RATE) / RATE
    sig = np.where(t < 1.0, 0.0,
                   0.4 * np.sin(2 * np.pi * 330 * t)
                   + 0.01 * rng.standard_normal(t.size)).astype(np.float32)[None]
    out_len = int(sig.shape[1] * 1.25)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, RATE, time_f=1.25)
    out, s = _render(sig, out_len)

    import os
    os.environ["SST_SILENCE"] = "0"
    try:
        out_off, ok = s.exact(sig, out_len)   # same instance: same executable
    finally:
        del os.environ["SST_SILENCE"]
    assert ok
    np.testing.assert_array_equal(out, np.asarray(out_off))
    # chaos-relative oracle gate (same recipe as test_corpus_stats), cut
    # clear of the RNG-divergent flush tail (docs/PARITY.md)
    cut = out.shape[1] - 4 * (800 + 320)
    pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
    ref2 = run_oracle(oracle_bin, str(tmp_path), pert, RATE, time_f=1.25)
    gate = max(-60.0, rel_err_db(ref2[:, :cut], ref[:, :cut]) + 18.0)
    assert rel_err_db(out[:, :cut], ref[:, :cut]) < gate


def test_silent_clip_cond_short_circuit(oracle_bin, tmp_path,
                                        fresh_compile_cache):
    """The single-clip jitted path lax.cond-skips the whole pipeline for a
    fully-silent clip: output must be exactly zeros (like the oracle's) and
    equal the SST_SILENCE=0 full render bit for bit (zero spectra propagate
    zeros)."""
    import os
    sig = np.zeros((2, 2 * RATE), np.float32)
    out_len = int(sig.shape[1] * 1.25)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, RATE, time_f=1.25)

    s = SignalsmithStretch(seed=1)
    s.preset_cheaper(2, RATE, split_computation=False)
    out, ok = s.exact(sig, out_len)
    assert ok and not np.asarray(out).any() and not ref.any()

    os.environ["SST_SILENCE"] = "0"
    try:
        # same instance: the silence enable is a runtime argument of the
        # one compiled executable (see test_partial_silence note)
        out_full, ok2 = s.exact(sig, out_len)
    finally:
        del os.environ["SST_SILENCE"]
    assert ok2
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_full))
