"""Corpus-scale statistical regression vs the oracle (ROADMAP verification).

Frequency-mapped renders are chaotic in *phase* (docs/PARITY.md), but band
energy envelopes are analysis-derived and stable — so a mixed corpus is gated
on third-octave-band energies and broadband envelopes at tight (sub-dB)
tolerances, complementing the sample-exact tests that must use chaos-relative
gates.
"""
import numpy as np
import pytest

from conftest import rel_err_db, run_oracle
from signalsmith_stretch_tpu.api import SignalsmithStretch


def _clip(kind, rate, seconds, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * seconds)) / rate
    if kind == "harmonic":
        sig = sum((0.5 / (i + 1)) * np.sin(2 * np.pi * 130 * (i + 1) * t + i)
                  for i in range(6))
    elif kind == "sweep":
        sig = 0.5 * np.sin(2 * np.pi * (100 * t + 400 * t * t))
    elif kind == "noise":
        sig = 0.3 * rng.standard_normal(t.shape)
    else:  # transient train
        sig = np.zeros_like(t)
        sig[::1600] = 1.0
        k = np.exp(-np.arange(200) / 30.0)
        sig = np.convolve(sig, k)[:t.size] * 0.5
    sig = sig + 0.01 * rng.standard_normal(t.shape)
    return sig[None, :].astype(np.float32)


def _band_energies(x, rate, n_fft=1024):
    """[ch, n] -> log10 energy per third-octave-ish band, time-averaged."""
    n = (x.shape[1] // n_fft) * n_fft
    frames = x[0, :n].reshape(-1, n_fft) * np.hanning(n_fft)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(n_fft, 1.0 / rate)
    edges = 50 * (2 ** (np.arange(0, 20) / 3.0))
    edges = edges[edges < rate / 2]
    e = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (freqs >= lo) & (freqs < hi)
        if m.any():
            e.append(spec[:, m].sum(axis=1).mean())
    return np.log10(np.asarray(e) + 1e-12)


CASES = [
    dict(time_f=1.25, semitones=0.0, tonality=0.0),
    dict(time_f=0.8, semitones=0.0, tonality=0.0),
    dict(time_f=1.0, semitones=3.0, tonality=2000.0),
    dict(time_f=1.2, semitones=-4.0, tonality=3000.0),
]
KINDS = ["harmonic", "sweep", "noise", "transients"]


@pytest.mark.parametrize("case", CASES, ids=lambda c: (
    f"t{c['time_f']}_st{c['semitones']}"))
def test_corpus_band_energy_regression(oracle_bin, tmp_path, case):
    rate = 8000
    max_band_err = 0.0
    for kind in KINDS:
        sig = _clip(kind, rate, 2.0, seed=hash(kind) % 1000)
        out_len = int(round(sig.shape[1] * case["time_f"]))
        # split=False: the engine is configured without splitComputation
        # below, and the oracle's step-split scheduler produces slightly
        # different inter-harmonic leakage (~2-4 dB in bands 30+ dB below
        # peak) — comparing mismatched modes was the original bug here
        ref = run_oracle(oracle_bin, str(tmp_path), sig, rate,
                         time_f=case["time_f"], semitones=case["semitones"],
                         tonality=case["tonality"], cheaper=True, split=False)
        s = SignalsmithStretch()
        s.preset_cheaper(1, rate)
        s.set_transpose_semitones(case["semitones"],
                                  case["tonality"] / rate)
        out, ok = s.exact(sig, out_len)
        out = np.asarray(out)
        assert ok and out.shape == ref.shape

        # band-energy distance (log10): < 0.05 ~ 0.5 dB per band for
        # unmapped renders; mapped renders reshuffle inter-harmonic leakage
        # through the chaotic phase recursion (~1 dB in bands far below
        # peak), so their gate is 1.5 dB -- still far below any real
        # frequency-map defect, which shifts whole harmonics by tens of dB
        be_mine = _band_energies(out, rate)
        be_ref = _band_energies(ref, rate)
        err = np.abs(be_mine - be_ref).max()
        max_band_err = max(max_band_err, err)
        tol = 0.05 if case["semitones"] == 0.0 else 0.15
        assert err < tol, (kind, case, err)

        # broadband envelope: 50 ms RMS windows within 0.5 dB RMS
        w = int(0.05 * rate)
        n = (out.shape[1] // w) * w
        env_m = np.sqrt((out[0, :n].reshape(-1, w) ** 2).mean(1) + 1e-12)
        env_r = np.sqrt((ref[0, :n].reshape(-1, w) ** 2).mean(1) + 1e-12)
        env_db = 20 * np.abs(np.log10(env_m / env_r)).mean()
        assert env_db < 0.5, (kind, case, env_db)

        # Unmapped renders must additionally be sample-close -- EXCLUDING
        # the flush tail: flush processes zero-input blocks, which drives
        # the reference's timeFactor to interval/max(1, inputInterval=0) >>
        # maxCleanStretch and engages the randomized-phase regime
        # (signalsmith-stretch.h:509, 639-640) for the last block+interval
        # of every stretched render.  Those phases come from the RNG, which
        # differs between C++ and JAX by design (see
        # test_random_regime_statistical); the band/envelope gates above
        # still cover the tail statistically.
        if case["semitones"] == 0.0:
            # the randomized flush blocks' synthesis windows overlap-add a
            # block back into the output, and the phase recursion carries
            # their influence further: cut well clear of the flush.  The
            # gate is chaos-relative like test_parity_exact: signals that
            # sweep across bins (the chirp) amplify ulp-level differences
            # through the phase recursion.
            cut = out.shape[1] - 4 * (800 + 320)   # preset_cheaper @8k
            pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
            ref2 = run_oracle(oracle_bin, str(tmp_path), pert, rate,
                              time_f=case["time_f"],
                              semitones=case["semitones"],
                              tonality=case["tonality"], cheaper=True,
                              split=False)
            gate = max(-60.0,
                       rel_err_db(ref2[:, :cut], ref[:, :cut]) + 12.0)
            assert rel_err_db(out[:, :cut], ref[:, :cut]) < gate, (
                kind, case, gate)
