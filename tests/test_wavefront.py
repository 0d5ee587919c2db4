"""Wavefront engine: skew algebra + equivalence with the per-block scan."""
import os

import jax
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


def test_sweep_row_group_tiling_matches_monolithic(monkeypatch):
    """The row-group-tiled sweep (SST_SWEEP_GROUP) must equal the monolithic
    sweep: rows before the first group boundary BIT FOR BIT, rows after it to
    compiler fma noise.  The injected lane-0 planes carry bit-identical
    values to what shift_k read from the adjacent lane, but the two scan
    bodies are separate XLA programs, so (on CPU) LLVM may contract the
    phase-vote multiply-adds differently — a ~1 ulp seed that the phase
    recursion then amplifies chaotically, exactly like the documented
    oracle-vs-engine chaos bound (docs/PARITY.md).  Keeping only 12 rows
    past the boundary bounds the amplification so the gate stays tight."""
    import jax
    rng = np.random.default_rng(5)
    ch, nB, B = 2, 140, 512        # nBp=256 -> groups of 128, 12 live rows
    longv = 6

    def c64(shape):
        return (rng.standard_normal(shape) +
                1j * rng.standard_normal(shape)).astype(np.complex64)

    pi = tuple(jnp.asarray(c64((nB, B))) for _ in range(ch))
    pe = tuple(p.real ** 2 + p.imag ** 2 for p in pi)
    inp = wavefront.SweepInputs(
        a1=jnp.asarray(c64((nB, B))), a2=jnp.asarray(c64((nB, B))),
        d1=jnp.asarray(c64((nB, B))), d2=jnp.asarray(c64((nB, B))),
        mc=jnp.zeros((nB, B), jnp.int32), pe=pe, pi=pi)

    def run():
        wavefront._sweep_unskew_fn.cache_clear()
        fn = wavefront._sweep_unskew_fn(longv, ch, True, B, 8)
        return np.asarray(jax.jit(fn)(inp))      # [ch, nB, B]

    monkeypatch.delenv("SST_SWEEP_GROUP", raising=False)
    mono = run()
    monkeypatch.setenv("SST_SWEEP_GROUP", "128")
    tiled = run()
    np.testing.assert_array_equal(tiled[:, :128], mono[:, :128])

    def ri(x):   # complex -> stacked real/imag (rel_err_db casts to float)
        return np.stack([x.real, x.imag])

    assert rel_err_db(ri(tiled[:, 128:]), ri(mono[:, 128:])) < -85

def test_sweep_pair_mode_group_tiling(monkeypatch):
    """Pair mode + row-group tiling together: nonzero cross-group injections
    must flow through the pair-mode [D, 2, ch, 2, batch] inj reshape (the
    plane-ordering path the monolithic pair test never exercises).  Same
    gates as the complex tiling test: rows before the first group boundary
    bit for bit, later rows to cross-program fma noise."""
    import jax
    rng = np.random.default_rng(11)
    ch, nB, B = 2, 140, 512        # nBp=256 -> groups of 128, 12 live rows
    longv = 6

    def c64(shape):
        return (rng.standard_normal(shape) +
                1j * rng.standard_normal(shape)).astype(np.complex64)

    pi = tuple(jnp.asarray(c64((nB, B))) for _ in range(ch))
    pe = tuple(p.real ** 2 + p.imag ** 2 for p in pi)
    inp = wavefront.SweepInputs(
        a1=jnp.asarray(c64((nB, B))), a2=jnp.asarray(c64((nB, B))),
        d1=jnp.asarray(c64((nB, B))), d2=jnp.asarray(c64((nB, B))),
        mc=jnp.zeros((nB, B), jnp.int32), pe=pe, pi=pi)

    def run():
        jax.clear_caches()
        wavefront._sweep_unskew_fn.cache_clear()
        fn = wavefront._sweep_unskew_fn(longv, ch, True, B, 8)
        return np.asarray(jax.jit(fn)(inp))      # [ch, nB, B]

    monkeypatch.setenv("SST_SWEEP_PAIR", "1")
    monkeypatch.delenv("SST_SWEEP_GROUP", raising=False)
    mono = run()
    monkeypatch.setenv("SST_SWEEP_GROUP", "128")
    tiled = run()
    np.testing.assert_array_equal(tiled[:, :128], mono[:, :128])

    def ri(x):
        return np.stack([x.real, x.imag])

    assert rel_err_db(ri(tiled[:, 128:]), ri(mono[:, 128:])) < -85


@pytest.mark.parametrize("ch", [1, 2, 3])
def test_sweep_pair_mode_matches_complex(monkeypatch, ch):
    """The f32-pair cell (SST_SWEEP_PAIR=1, the TPU default) mirrors the
    complex64 cell's math with identical operand/addition order, but the
    two are separate XLA programs: the compiler may contract the vote
    multiply-adds into fmas differently (measured ~1 ulp seeds on CPU at
    ch=1), which the phase recursion amplifies chaotically — the same
    bound as the group-tiling test above.  A short 12-row recursion keeps
    the amplification under -80 dB; real parity is enforced by the oracle
    gates, which run whichever mode the backend selects.  ch=3 exercises
    the carried-mc plane; ch<=2 the recomputed argmax."""
    import jax
    rng = np.random.default_rng(7)
    nB, B = 12, 256
    longv = 6

    def c64(shape):
        return (rng.standard_normal(shape) +
                1j * rng.standard_normal(shape)).astype(np.complex64)

    pi = tuple(jnp.asarray(c64((nB, B))) for _ in range(ch))
    pe = tuple(p.real ** 2 + p.imag ** 2 for p in pi)
    mc = jnp.asarray(rng.integers(0, ch, (nB, B)).astype(np.int32))
    inp = wavefront.SweepInputs(
        a1=jnp.asarray(c64((nB, B))), a2=jnp.asarray(c64((nB, B))),
        d1=jnp.asarray(c64((nB, B))), d2=jnp.asarray(c64((nB, B))),
        mc=mc, pe=pe, pi=pi)

    def run():
        jax.clear_caches()
        wavefront._sweep_unskew_fn.cache_clear()
        fn = wavefront._sweep_unskew_fn(longv, ch, True, B, 8)
        return np.asarray(jax.jit(fn)(inp))      # [ch, nB, B]

    monkeypatch.setenv("SST_SWEEP_PAIR", "0")
    ref = run()
    monkeypatch.setenv("SST_SWEEP_PAIR", "1")
    got = run()

    def ri(x):
        return np.stack([x.real, x.imag])

    assert rel_err_db(ri(got), ri(ref)) < -80


@pytest.mark.parametrize("mode", ["static", "scan"])
def test_sweep_skew_modes_match_merge(monkeypatch, mode):
    """The TPU skew builders (static pads / traced-offset row scan) must
    place every row at the same group-local diagonal offset as the CPU
    pitch-merge: pure data movement, so bit equality is exact."""
    import jax
    rng = np.random.default_rng(9)
    ch, nB, B = 2, 140, 512
    longv = 6

    def c64(shape):
        return (rng.standard_normal(shape) +
                1j * rng.standard_normal(shape)).astype(np.complex64)

    pi = tuple(jnp.asarray(c64((nB, B))) for _ in range(ch))
    pe = tuple(p.real ** 2 + p.imag ** 2 for p in pi)
    inp = wavefront.SweepInputs(
        a1=jnp.asarray(c64((nB, B))), a2=jnp.asarray(c64((nB, B))),
        d1=jnp.asarray(c64((nB, B))), d2=jnp.asarray(c64((nB, B))),
        mc=jnp.zeros((nB, B), jnp.int32), pe=pe, pi=pi)

    def run():
        jax.clear_caches()
        wavefront._sweep_unskew_fn.cache_clear()
        fn = wavefront._sweep_unskew_fn(longv, ch, True, B, 8)
        return np.asarray(jax.jit(fn)(inp))

    monkeypatch.setenv("SST_SWEEP_GROUP", "128")
    monkeypatch.setenv("SST_SKEW", "merge")
    ref = run()
    monkeypatch.setenv("SST_SKEW", mode)
    got = run()
    np.testing.assert_array_equal(got, ref)


def test_pair_plan_matches_complex(monkeypatch):
    """The all-pair planner tail (_plan_tail_pair, the TPU spectra flow) must
    reproduce the complex planner's SweepInputs: same formulas with the
    complex mul/conj expanded exactly as XLA lowers them, so pre-recursion
    coefficients agree to float rounding (no chaos amplification here)."""
    from signalsmith_stretch_tpu.models import StretchModel
    rate = 8000
    model = StretchModel.build(channels=2, sample_rate=rate, cheaper=True,
                               in_samples=rate, out_samples=int(rate * 1.25))
    plan = model.plan
    nB = len(plan.arrays["new_spectrum"])
    B = plan.consts.bands
    rng = np.random.default_rng(5)

    def c64(shape):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    sp, pv = c64((nB, 2, B)), c64((nB, 2, B))
    ref = wavefront.plan_spectral(jnp.asarray(sp), jnp.asarray(pv),
                                  plan.arrays, model.controls, model.flags,
                                  plan.consts, 0)
    got = wavefront.plan_spectral(
        (jnp.asarray(sp.real), jnp.asarray(sp.imag)),
        (jnp.asarray(pv.real), jnp.asarray(pv.imag)),
        plan.arrays, model.controls, model.flags, plan.consts, 0)
    assert isinstance(got.a1, tuple)
    for name in ("a1", "a2", "d1", "d2"):
        r = getattr(ref, name)
        g = getattr(got, name)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(r.real),
                                   rtol=0, atol=2e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(r.imag),
                                   rtol=0, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got.mc), np.asarray(ref.mc))
    for c in range(2):
        np.testing.assert_array_equal(np.asarray(got.pi[c][0]),
                                      np.asarray(ref.pi[c].real))
        np.testing.assert_array_equal(np.asarray(got.pi[c][1]),
                                      np.asarray(ref.pi[c].imag))


@pytest.mark.parametrize("kind", ["mapped", "formant", "random"])
def test_pair_plan_main_path_matches_complex(monkeypatch, kind):
    """The MAIN planner path (mapped / formant / randomized-stretch cases)
    in pair mode (round 5) reproduces the complex planner's SweepInputs:
    the polymorphic helpers expand complex mul/conj exactly as XLA lowers
    them, so votes agree to float rounding and everything real (pe, mc,
    pi planes, interp positions) is bit-identical."""
    from signalsmith_stretch_tpu.models import StretchModel
    rate = 8000
    kw = dict(channels=2, sample_rate=rate, cheaper=True,
              in_samples=rate, out_samples=int(rate * 1.25))
    if kind == "mapped":
        kw.update(semitones=12, tonality_hz=2000)
    elif kind == "formant":
        kw.update(formant_semitones=5)
    else:
        kw.update(out_samples=int(rate * 2.5))   # tf > 2: randomized votes
    model = StretchModel.build(**kw)
    plan = model.plan
    nB = len(plan.arrays["new_spectrum"])
    B = plan.consts.bands
    rng = np.random.default_rng(7)

    def c64(shape):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(np.complex64)

    sp, pv = c64((nB, 2, B)), c64((nB, 2, B))
    ref = wavefront.plan_spectral(jnp.asarray(sp), jnp.asarray(pv),
                                  plan.arrays, model.controls, model.flags,
                                  plan.consts, 0)
    got = wavefront.plan_spectral(
        (jnp.asarray(sp.real), jnp.asarray(sp.imag)),
        (jnp.asarray(pv.real), jnp.asarray(pv.imag)),
        plan.arrays, model.controls, model.flags, plan.consts, 0)
    assert isinstance(got.a1, tuple)
    for name in ("a1", "a2", "d1", "d2"):
        r = getattr(ref, name)
        g = getattr(got, name)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(r.real),
                                   rtol=0, atol=2e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(r.imag),
                                   rtol=0, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got.mc), np.asarray(ref.mc))
    for c in range(2):
        np.testing.assert_array_equal(np.asarray(got.pe[c]),
                                      np.asarray(ref.pe[c]))
        np.testing.assert_array_equal(np.asarray(got.pi[c][0]),
                                      np.asarray(ref.pi[c].real))
        np.testing.assert_array_equal(np.asarray(got.pi[c][1]),
                                      np.asarray(ref.pi[c].imag))


def test_pair_spectra_flow_mapped_end_to_end(monkeypatch, test_signal):
    """Full exact() render with pitch shift + formants: pair spectra flow
    (SST_SPECTRA_PAIR=1, TPU default) vs the complex CPU default — the
    round-5 pair main path, gated like the unmapped flow test."""
    sig, rate = test_signal
    sig = sig[:, :rate]

    def render():
        s = sst.SignalsmithStretch(seed=1)
        s.preset_cheaper(1, rate, False)
        s.set_transpose_semitones(3, 2000 / rate)
        s.set_formant_semitones(2, False)
        out, ok = s.exact(sig, int(sig.shape[1] * 1.25))
        assert ok
        return np.asarray(out)

    monkeypatch.setenv("SST_SPECTRA_PAIR", "0")
    base = render()
    monkeypatch.setenv("SST_SPECTRA_PAIR", "1")
    pair = render()
    assert rel_err_db(pair, base) < -80


def test_pair_spectra_flow_end_to_end(monkeypatch, test_signal):
    """SST_SPECTRA_PAIR=1 (the TPU default flow: planar DFT -> pair planner
    -> pair sweep) vs the complex CPU default, full exact() render: values
    differ only by reassociation noise amplified through the phase
    recursion (measured -107 dB on this clip; gate -80)."""
    sig, rate = test_signal
    sig = sig[:, :rate]

    def render():
        s = sst.SignalsmithStretch(seed=1)
        s.preset_cheaper(1, rate, False)
        out, ok = s.exact(sig, int(sig.shape[1] * 1.25))
        assert ok
        return np.asarray(out)

    monkeypatch.setenv("SST_SPECTRA_PAIR", "0")
    base = render()
    monkeypatch.setenv("SST_SPECTRA_PAIR", "1")
    pair = render()
    monkeypatch.setenv("SST_SWEEP_PAIR", "1")
    pair2 = render()
    assert rel_err_db(pair, base) < -80
    assert rel_err_db(pair2, base) < -80


def test_peaks_map_merge_matches_windowed(monkeypatch):
    """The sort-merge peaks/output-map builder (SST_PEAKMAP=merge, the TPU
    default) reproduces the windowed-taps builder: same math, segment sums
    accumulated in scan-tree vs one-hot-matmul order (~1 ulp on centroids,
    amplified only through the smoothstep tail — gate tight)."""
    from signalsmith_stretch_tpu.models import StretchModel
    from signalsmith_stretch_tpu import spectral as sp
    from signalsmith_stretch_tpu.ops import scan_ops
    rate = 8000
    model = StretchModel.build(channels=1, sample_rate=rate, cheaper=True,
                               in_samples=2 * rate, out_samples=2 * rate,
                               semitones=7, tonality_hz=2000)
    plan = model.plan
    consts, flags, controls = plan.consts, model.flags, model.controls
    nB = len(plan.arrays["new_spectrum"])
    B = consts.bands
    rng = np.random.default_rng(11)
    energy = jnp.asarray((rng.uniform(0, 1, (nB, B)) ** 4)
                         .astype(np.float32))
    sm = energy
    e = jnp.zeros(nB, jnp.float32)
    for _ in range(2):
        sm, e = scan_ops.iir_backward(sm, e, np.float32(consts.slew))
        sm, e = scan_ops.iir_forward(sm, e, np.float32(consts.slew))
    geom = wavefront._window_geometry(flags.inv_grad_bound, 7.0)

    monkeypatch.setenv("SST_PEAKMAP", "window")
    ib_w, fg_w, bad_w = jax.jit(
        lambda en, s: wavefront._peaks_and_map_batched(
            en, s, controls, flags, consts, geom))(energy, sm)
    monkeypatch.setenv("SST_PEAKMAP", "merge")
    ib_m, fg_m, bad_m = jax.jit(
        lambda en, s: wavefront._peaks_and_map_batched(
            en, s, controls, flags, consts, geom))(energy, sm)
    assert int(bad_w) == 0 and int(bad_m) == 0
    np.testing.assert_allclose(np.asarray(ib_m), np.asarray(ib_w),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fg_m), np.asarray(fg_w),
                               rtol=0, atol=1e-3)
    # and both against the per-block reference engine's builder
    ib_r, fg_r = jax.vmap(
        lambda en, s: sp._peaks_and_map(en, s, controls, flags, consts))(
            energy, sm)
    np.testing.assert_allclose(np.asarray(ib_m), np.asarray(ib_r),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fg_m), np.asarray(fg_r),
                               rtol=0, atol=1e-3)


@pytest.mark.parametrize("semis,ton", [(12, 8000), (-3, 6000), (-24, 2000),
                                       (0.5, 8000)])
def test_peaks_invmap_matches_merge(semis, ton):
    """The inverse-anchored peaks builder (SST_PEAKMAP=invmap, the TPU
    default for the standard map) is BIT-identical to the sort-merge
    builder: same selected peaks (prefix boundary via the same map-space
    float chain), same centroid payloads, same smoothstep tail."""
    from signalsmith_stretch_tpu.models import StretchModel
    from signalsmith_stretch_tpu.ops import interp as oi
    from signalsmith_stretch_tpu.ops import scan_ops
    rng = np.random.default_rng(1)
    m = StretchModel.build(channels=2, sample_rate=48000, in_samples=48000,
                          out_samples=60000, semitones=semis,
                          tonality_hz=ton)
    consts = m.plan.consts
    B = consts.bands
    nB = 10
    e = (rng.uniform(size=(nB, B)).astype(np.float32)) ** 3
    e[3] = 0          # silent row: no peaks
    e[4] = 1.0        # constant row
    sm = jnp.asarray(e)
    ee = jnp.zeros(nB, jnp.float32)
    for _ in range(2):
        sm, ee = scan_ops.iir_backward(sm, ee, np.float32(consts.slew))
        sm, ee = scan_ops.iir_forward(sm, ee, np.float32(consts.slew))
    ej = jnp.asarray(e)
    ib1, fg1, _ = oi._peaks_and_map_merge(ej, sm, m.controls, m.flags,
                                          consts)
    ib2, fg2, v2 = oi._peaks_and_map_invmap(ej, sm, m.controls, m.flags,
                                            consts)
    np.testing.assert_array_equal(np.asarray(ib1), np.asarray(ib2))
    np.testing.assert_array_equal(np.asarray(fg1), np.asarray(fg2))
    assert int(v2) == 0


def test_peaks_invmap_fallback_eligibility(monkeypatch):
    """SST_PEAKMAP=invmap with per-block (automated) controls must fall
    back to the merge builder rather than mis-anchor: the inverse needs
    one shared [B] anchor vector and an invertible map."""
    from signalsmith_stretch_tpu.models import StretchModel
    from signalsmith_stretch_tpu.ops import interp as oi
    from signalsmith_stretch_tpu import spectral as sp
    rng = np.random.default_rng(2)
    m = StretchModel.build(channels=2, sample_rate=48000, in_samples=48000,
                          out_samples=60000, semitones=7, tonality_hz=4000)
    consts = m.plan.consts
    B = consts.bands
    nB = 6
    e = (rng.uniform(size=(nB, B)).astype(np.float32)) ** 3
    sm = e * np.float32(0.8)
    monkeypatch.setenv("SST_PEAKMAP", "invmap")
    # automated controls: [nB, 1]-leaf Controls -> merge fallback (must
    # not raise and must equal merge exactly)
    auto = sp.Controls(*[jnp.broadcast_to(c, (nB, 1)) for c in m.controls])
    got = oi._peaks_and_map_batched(jnp.asarray(e), jnp.asarray(sm), auto,
                                    m.flags, consts, (64, 128))
    monkeypatch.setenv("SST_PEAKMAP", "merge")
    ref = oi._peaks_and_map_batched(jnp.asarray(e), jnp.asarray(sm), auto,
                                    m.flags, consts, (64, 128))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
