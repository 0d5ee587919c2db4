"""Golden parity: exact() vs the compiled C++ reference, gate at -60 dB.

Mirrors the reference's own regression gate (cmd/main-dev.cpp:212-233) but
against the live oracle rather than stored renders.  Stretch ratios stay <= 2
(above that the reference randomizes per-bin phases with its own RNG,
signalsmith-stretch.h:639-640 — see test_random_regime for the statistical
check).
"""
import numpy as np
import pytest

import signalsmith_stretch_tpu as sst

from conftest import rel_err_db, run_oracle

GATE_DB = -60.0


def _render(sig, rate, time_f=1.0, semitones=0.0, tonality=0.0, formant=0.0,
            formant_comp=False, formant_base=0.0, cheaper=True, split=False):
    s = sst.SignalsmithStretch(seed=1)
    preset = s.preset_cheaper if cheaper else s.preset_default
    preset(sig.shape[0], rate, split)
    s.set_transpose_semitones(semitones, tonality / rate)
    s.set_formant_semitones(formant, formant_comp)
    s.set_formant_base(formant_base / rate)
    out, ok = s.exact(sig, int(round(sig.shape[1] * time_f)))
    assert ok
    return out


def _chaos_bound(oracle_bin, tmpdir, sig, rate, case):
    """The oracle's own 1-ulp input sensitivity for this case (docs/PARITY.md)."""
    a = run_oracle(oracle_bin, tmpdir, sig, rate, **case)
    pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
    b = run_oracle(oracle_bin, tmpdir, pert, rate, **case)
    return rel_err_db(b, a)


def _gate(oracle_bin, tmpdir, sig, rate, case):
    """-60 dB, relaxed only where the reference itself is chaotic: the
    implementation must stay within 12 dB of the oracle's intrinsic 1-ulp
    sensitivity."""
    bound = _chaos_bound(oracle_bin, tmpdir, sig, rate, case)
    return max(GATE_DB, bound + 12.0)


# (case, stable) — stable cases take the strict full-length gate
CASES = [
    (dict(), True),                                     # identity
    (dict(time_f=1.25), False),                         # BASELINE config #1 shape
    (dict(time_f=0.8), False),
    (dict(semitones=5, tonality=2000), False),          # pitch + tonality limit
    (dict(semitones=-7), False),
    (dict(time_f=1.3, semitones=5, tonality=2000), False),
    (dict(formant=3, formant_base=110), True),          # formant shift
    (dict(semitones=5, tonality=2000, formant=0.001, formant_comp=True), False),
    (dict(formant=4), True),                            # auto pitch detection
]


@pytest.mark.parametrize("case,stable", CASES,
                         ids=[str(sorted(c.items())) for c, _ in CASES])
def test_exact_parity_mono(oracle_bin, test_signal, tmp_path, case, stable):
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, **case)
    out = _render(sig, rate, **case)
    assert out.shape == ref.shape
    db = rel_err_db(out, ref)
    gate = GATE_DB if stable else _gate(oracle_bin, str(tmp_path), sig, rate, case)
    assert db < gate, f"parity {db:.1f} dB vs gate {gate:.1f}"


def test_exact_parity_stereo(oracle_bin, stereo_signal, tmp_path):
    sig, rate = stereo_signal
    case = dict(time_f=1.25, semitones=3, tonality=2000)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, **case)
    out = _render(sig, rate, **case)
    db = rel_err_db(out, ref)
    assert db < _gate(oracle_bin, str(tmp_path), sig, rate, case), db


def test_exact_parity_split(oracle_bin, test_signal, tmp_path):
    """splitComputation: same engine output through the +interval latency path."""
    sig, rate = test_signal
    case = dict(time_f=1.25, split=True)
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, **case)
    out = _render(sig, rate, time_f=1.25, split=True)
    db = rel_err_db(out, ref)
    assert db < _gate(oracle_bin, str(tmp_path), sig, rate, case), db


def test_exact_too_short_input(test_signal):
    sig, rate = test_signal
    s = sst.SignalsmithStretch()
    s.preset_cheaper(1, rate)
    short = sig[:, :100]
    out, ok = s.exact(short, 100)
    assert not ok
    assert np.all(out == 0)


def test_custom_freq_map(oracle_bin, test_signal, tmp_path):
    """setFreqMap: the piecewise tonality map expressed as a custom callable
    must match the built-in map (and hence the oracle)."""
    import jax.numpy as jnp
    sig, rate = test_signal
    semis, tonality = 5.0, 2000.0
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, semitones=semis,
                     tonality=tonality)

    mult = np.float32(2.0 ** (np.float32(semis) / np.float32(12)))
    limit = np.float32(np.float32(tonality / rate) / np.float32(np.sqrt(mult)))

    def custom(freq):
        return jnp.where(freq > limit, freq + (mult - 1) * limit, freq * mult)

    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate)
    s.set_freq_map(custom)
    out, ok = s.exact(sig, sig.shape[1])
    assert ok
    db = rel_err_db(np.asarray(out), ref)
    # mapped regime: chaos-relative gate (docs/PARITY.md)
    gate = _gate(oracle_bin, str(tmp_path), sig, rate,
                 dict(semitones=semis, tonality=tonality))
    assert db < gate, (db, gate)


@pytest.mark.slow
def test_random_regime_statistical(oracle_bin, test_signal, tmp_path):
    """>2x stretch uses randomized phases (RNGs differ by design); compare
    spectral envelopes instead of samples."""
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, time_f=3.0)
    out = _render(sig, rate, time_f=3.0)
    assert out.shape == ref.shape

    def band_energy(x):
        spec = np.abs(np.fft.rfft(x[0] * np.hanning(x.shape[1])))
        edges = np.linspace(0, len(spec), 24, dtype=int)
        return np.array([np.sum(spec[a:b] ** 2) for a, b in zip(edges, edges[1:])])

    e_ref = band_energy(ref)
    e_out = band_energy(np.asarray(out))
    ratio = np.log10((e_out + 1e-9) / (e_ref + 1e-9))
    assert np.all(np.abs(ratio) < 0.5), ratio  # band energies within ~3 dB
