"""Edge coverage: odd geometries, stereo locking, mapped streaming, CLI."""
import os
import subprocess
import sys

import numpy as np
import pytest

import signalsmith_stretch_tpu as sst
from signalsmith_stretch_tpu.config import StretchConfig

from conftest import rel_err_db, run_oracle, write_raw, read_raw


def test_manual_configure_geometry(oracle_bin, tmp_path):
    """configure() with non-preset (odd) block/interval matches the oracle's
    geometry arithmetic."""
    cfg = StretchConfig(1, 777, 222, False)
    assert cfg.fft_samples == 1024
    assert cfg.bands == 512
    assert cfg.input_latency == 388      # 777 // 2
    assert cfg.output_latency == 389     # 777 - 777//2
    assert cfg.seek_length == 999
    # split adds one interval of output latency (signalsmith-stretch.h:46)
    cfg_s = StretchConfig(1, 777, 222, True)
    assert cfg_s.output_latency == 389 + 222


def test_odd_geometry_render(test_signal):
    """Odd block/interval sizes render sanely end to end."""
    sig, rate = test_signal
    s = sst.SignalsmithStretch(seed=1)
    s.configure(1, 777, 222)
    out, ok = s.exact(sig[:, :8000], 9000)
    assert ok and out.shape == (1, 9000)
    assert np.sqrt(np.mean(out[:, 2000:8000] ** 2)) > 0.1


def test_stereo_phase_locking(stereo_signal):
    """Channels stay phase-locked: a correlated stereo pair must keep its
    inter-channel correlation through a pitch shift (the reference locks all
    channels to the max-energy channel, :791-800)."""
    sig, rate = stereo_signal
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(2, rate, False)
    s.set_transpose_semitones(4, 2000 / rate)
    out, ok = s.exact(sig, sig.shape[1])
    assert ok
    a, b = out[0, 2000:14000], out[1, 2000:14000]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    ai, bi = sig[0, 2000:14000], sig[1, 2000:14000]
    corr_in = np.dot(ai, bi) / (np.linalg.norm(ai) * np.linalg.norm(bi))
    assert corr > 0.5 * corr_in, (corr, corr_in)


def test_streaming_mapped_parity(oracle_bin, test_signal, tmp_path):
    """Pitch-shifted streaming matches the oracle stream mode over the early
    (pre-chaos) region."""
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="stream",
                     chunk=512, semitones=4, tonality=2000)
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    s.set_transpose_semitones(4, 2000 / rate)
    in_lat = s.input_latency()
    pad = np.concatenate([sig, np.zeros((1, in_lat), np.float32)], 1)
    s.seek(pad[:, :in_lat], 1.0)
    outs, done = [], 0
    while done < sig.shape[1]:
        n = min(512, sig.shape[1] - done)
        outs.append(s.process(pad[:, in_lat + done:in_lat + done + n], n))
        done += n
    out = np.concatenate(outs, 1)
    db = rel_err_db(out[:, :6000], ref[:, :6000])
    assert db < -35, db  # mapped regime: early region before chaos growth


def test_cli_subprocess_roundtrip(test_signal, tmp_path):
    """The CLI end to end in a fresh process (raw I/O, exact length)."""
    sig, rate = test_signal
    inp = str(tmp_path / "in.raw")
    outp = str(tmp_path / "out.raw")
    write_raw(inp, sig[:, :8000], rate)
    env = dict(os.environ)
    # pin the child to CPU: the test process's conftest backend choice does
    # not propagate, and a wedged TPU attachment would hang the child at
    # backend init (SST_PLATFORM survives site-level JAX_PLATFORMS injection)
    env["SST_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "signalsmith_stretch_tpu.cli", inp, outp,
         "--raw", "--cheaper", "--time=1.25", "--semitones=2"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-500:]
    out, orate = read_raw(outp)
    assert orate == rate and out.shape == (1, 10000)
    assert np.isfinite(out).all() and np.abs(out).max() > 0.01


def test_scheduler_live_input_mode(test_signal):
    """Worklet live-input mode (web-wrapper.js:255-266): quantum in, quantum
    out with engine latency."""
    from signalsmith_stretch_tpu.scheduler import StretchNode
    sig, rate = test_signal
    node = StretchNode(rate, channels=1, preset="cheaper", quantum=400)
    node.schedule(semitones=0.0, rate=1.0)
    out = node.render(1.0, live_input=sig)
    assert out.shape == (1, rate)
    # live mode has no seek pre-roll: latency = inputLatency + outputLatency
    lat = node.cfg.input_latency + node.cfg.output_latency
    sl = slice(4000, 7000)
    db = rel_err_db(out[:, sl], sig[:, sl.start - lat:sl.stop - lat])
    assert db < -40, db


def test_exact_automation_pitch_ramp(test_signal):
    """Per-block automation: a semitone ramp glides the pitch across the
    render (BASELINE config #4's automation sweep, offline engine)."""
    sig, rate = test_signal
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    dur = sig.shape[1] / rate
    out, ok = s.exact(sig, sig.shape[1], automation={
        "sample_rate": rate,
        "semitones": lambda t: 12.0 * t / dur,   # 0 -> +12 st ramp
        "tonality_limit": 2000.0 / rate,
    })
    assert ok

    def peak_hz(seg):
        sp = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        return np.fft.rfftfreq(len(seg), 1 / rate)[np.argmax(sp)]

    f_start = peak_hz(out[0, 2000:6000])
    f_end = peak_hz(out[0, -6000:-2000])
    assert 100 < f_start < 135, f_start          # ~110 Hz at the start
    assert 185 < f_end < 245, f_end              # ~220 Hz near the end


def test_exact_automation_constant_matches_plain(test_signal):
    """Constant automation must agree with the plain setter path.

    Compared over a short horizon: the two paths compile separately, and
    XLA's run-to-run codegen variation injects ulp-level differences that the
    mapped regime's chaotic recursion amplifies over long renders
    (docs/PARITY.md) — the equivalence being tested is the control values,
    not long-horizon bit stability."""
    sig, rate = test_signal
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    s.set_transpose_semitones(4, 2000 / rate)
    a, _ = s.exact(sig[:, :8000], 8000)

    s2 = sst.SignalsmithStretch(seed=1)
    s2.preset_cheaper(1, rate, False)
    b, _ = s2.exact(sig[:, :8000], 8000, automation={
        "semitones": 4.0, "tonality_limit": 2000.0 / rate})
    db = rel_err_db(b[:, :5000], a[:, :5000])
    assert db < -40, db


@pytest.mark.parametrize("block,interval", [(900, 270), (1000, 330), (900, 160)])
def test_custom_geometry_parity(oracle_bin, test_signal, tmp_path, block,
                                interval):
    """Manual configure() geometries (odd intervals, different
    longVerticalStep) match the oracle."""
    sig, rate = test_signal
    sig = sig[:, :16000]
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, block=block,
                     interval=interval)
    s = sst.SignalsmithStretch(seed=1)
    s.configure(1, block, interval)
    out, ok = s.exact(sig, sig.shape[1])
    assert ok and out.shape == ref.shape
    db = rel_err_db(out, ref)
    assert db < -60, db


@pytest.mark.parametrize("time_f", [0.15, 0.1])
def test_extreme_compression_parity(oracle_bin, test_signal, tmp_path, time_f):
    """Extreme time-compression engages the reference's copyInput skip path
    (drops history beyond block+interval per block, :215-229); the static
    timeline reproduces it because frames never span the dropped gap."""
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, time_f=time_f)
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    out, ok = s.exact(sig, int(round(sig.shape[1] * time_f)))
    assert ok and out.shape == ref.shape
    db = rel_err_db(out, ref)
    # heavy compression is deep in the chaotic regime; verify against the
    # oracle's own 1-ulp sensitivity bound
    pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
    ref2 = run_oracle(oracle_bin, str(tmp_path), pert, rate, time_f=time_f)
    bound = rel_err_db(ref2, ref)
    assert db < max(-60, bound + 12), (db, bound)


@pytest.mark.parametrize("in_len,out_len", [
    (3000, 3000),    # barely above seek length
    (8000, 2500),    # strong compression
    (2400, 7200),    # 3x stretch from a short clip
    (8001, 9973),    # coprime odd lengths
    (7999, 8000),    # off-by-one
])
def test_schedule_shape_fuzz(test_signal, in_len, out_len):
    """Odd (in, out) pairs must render without index errors, with finite
    output of exactly the requested length."""
    sig, rate = test_signal
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    out, ok = s.exact(sig[:, :in_len], out_len)
    assert out.shape == (1, out_len)
    assert np.isfinite(out).all()
    if ok:
        assert np.abs(out[:, out_len // 4: out_len // 2]).max() > 1e-4


def test_three_channel_render_matches_oracle(tmp_path):
    """channels > 2 exercises the sweep's carried max-channel plane
    (wavefront carry_mc) — untested elsewhere.  Unmapped stretch at -60 dB
    vs the oracle, and a mapped render must stay finite/energy-sane."""
    from conftest import rel_err_db, run_oracle
    import os
    rng = np.random.default_rng(9)
    rate = 8000
    t = np.arange(2 * rate) / rate
    sig = np.stack([
        0.4 * np.sin(2 * np.pi * 165 * t),
        0.3 * np.sin(2 * np.pi * 220 * t + 0.4),
        0.25 * np.sin(2 * np.pi * 330 * t + 1.1),
    ]).astype(np.float32) + 0.01 * rng.standard_normal((3, t.size)).astype(
        np.float32)
    out_len = int(sig.shape[1] * 1.25)
    oracle = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "oracle", "oracle")
    ref = run_oracle(oracle, str(tmp_path), sig, rate, time_f=1.25)

    from signalsmith_stretch_tpu.api import SignalsmithStretch
    s = SignalsmithStretch()
    s.preset_cheaper(3, rate, split_computation=False)
    out, ok = s.exact(sig, out_len)
    assert ok
    out = np.asarray(out)
    assert out.shape == ref.shape
    cut = out.shape[1] - 4 * (s.block_samples() + s.interval_samples())
    # chaos-relative gate: more channels couple more phase-locking paths, so
    # the recursion diverges faster — measured segment-by-segment, our error
    # tracks the oracle's own 1-ulp sensitivity curve within a few dB
    pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
    ref2 = run_oracle(oracle, str(tmp_path), pert, rate, time_f=1.25)
    gate = max(-60.0, rel_err_db(ref2[:, :cut], ref[:, :cut]) + 12.0)
    assert rel_err_db(out[:, :cut], ref[:, :cut]) < gate

    s2 = SignalsmithStretch()
    s2.preset_cheaper(3, rate, split_computation=False)
    s2.set_transpose_semitones(5.0, tonality_limit=3000.0 / rate)
    out2, ok2 = s2.exact(sig, out_len)
    assert ok2
    out2 = np.asarray(out2)
    assert np.isfinite(out2).all()
    e_in = float((sig ** 2).mean())
    e_out = float((out2 ** 2).mean())
    assert 0.2 * e_in < e_out < 5 * e_in


def test_pluggable_random_engine(test_signal, fresh_compile_cache):
    """The RandomEngine analogue (signalsmith-stretch.h:34-39, 610-616): a
    custom engine changes the >2x-stretch randomized phases, the default is
    reproducible from the seed (same executable), and sub-2x renders never
    trace the engine.  Equality across SEPARATELY-compiled executables is
    deliberately not asserted: XLA CPU fma contraction varies compile to
    compile (~1e-5, chaos-amplified; docs/PARITY.md)."""
    import jax
    import jax.numpy as jnp
    sig, rate = test_signal
    sig = sig[:, :rate]
    out_len = int(sig.shape[1] * 3.0)       # > maxCleanStretch: RNG active

    def make(engine, seed=1):
        s = sst.SignalsmithStretch(seed=seed, random_engine=engine)
        s.preset_cheaper(1, rate, split_computation=False)
        return s

    def render(s, out_n=out_len):
        out, ok = s.exact(sig, out_n)
        assert ok
        return np.asarray(out)

    calls = []

    def midpoint_engine(key, shape, minval, maxval):
        # degenerate "RNG": every draw at the range midpoint
        calls.append(shape)
        mid = (jnp.asarray(minval, jnp.float32)
               + jnp.asarray(maxval, jnp.float32)) * jnp.float32(0.5)
        return jnp.broadcast_to(mid, shape).astype(jnp.float32)

    s_def = make(None)
    base = render(s_def)
    assert np.array_equal(base, render(s_def))   # seeded determinism
    custom = render(make(midpoint_engine))
    assert len(calls) > 0                        # engine traced at 3x
    assert np.isfinite(custom).all()
    assert not np.array_equal(base, custom)      # draws actually differ
    # alternate jax.random bit generator through the same hook
    alt = render(make(lambda k, sh, lo, hi: jax.random.uniform(
        jax.random.fold_in(k, 7), sh, jnp.float32, minval=lo, maxval=hi)))
    assert not np.array_equal(base, alt)

    # <= maxCleanStretch: binTimeFactors are deterministic and the engine is
    # never traced (any_random is static); values agree to compile variance
    calls.clear()
    clean_n = int(sig.shape[1] * 1.25)
    from conftest import rel_err_db
    a = render(make(None), out_n=clean_n)
    b = render(make(midpoint_engine), out_n=clean_n)
    assert calls == []                           # engine unused below 2x
    assert rel_err_db(b, a) < -60                # identical program, two
    #                                              compiles: fma variance only
