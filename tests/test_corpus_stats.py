"""Corpus-scale statistical regression vs the oracle (ROADMAP verification).

Frequency-mapped renders are chaotic in *phase* (docs/PARITY.md), but band
energy envelopes are analysis-derived and stable — so a mixed corpus is gated
on third-octave-band energies and broadband envelopes at tight (sub-dB)
tolerances, complementing the sample-exact tests that must use chaos-relative
gates.

Clip seeds are pinned (utils/evaluation.KIND_SEEDS): Python's salted hash()
previously picked different clips per process, which made "suite green"
unfalsifiable run to run.
"""
import numpy as np
import pytest

from conftest import rel_err_db, run_oracle
from signalsmith_stretch_tpu.api import SignalsmithStretch
from signalsmith_stretch_tpu.utils.evaluation import (
    KINDS, band_energies, envelope_db, synth_clip)

CASES = [
    dict(time_f=1.25, semitones=0.0, tonality=0.0),
    dict(time_f=0.8, semitones=0.0, tonality=0.0),
    dict(time_f=1.0, semitones=3.0, tonality=2000.0),
    dict(time_f=1.2, semitones=-4.0, tonality=3000.0),
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: (
    f"t{c['time_f']}_st{c['semitones']}"))
def test_corpus_band_energy_regression(oracle_bin, tmp_path, case):
    rate = 8000
    for kind in KINDS:
        sig = synth_clip(kind, rate, 2.0)
        out_len = int(round(sig.shape[1] * case["time_f"]))
        # split=False: the engine is configured without splitComputation
        # below, and the oracle's step-split scheduler produces slightly
        # different inter-harmonic leakage (~2-4 dB in bands 30+ dB below
        # peak) — comparing mismatched modes was the original bug here
        ref = run_oracle(oracle_bin, str(tmp_path), sig, rate,
                         time_f=case["time_f"], semitones=case["semitones"],
                         tonality=case["tonality"], cheaper=True, split=False)
        s = SignalsmithStretch()
        # split_computation must match the oracle's mode: split shifts block
        # output placement by one interval, which moves transient energy
        # ~40 ms (up to ~1 dB in 50 ms envelope windows) and reshuffles the
        # step-split scheduler's inter-harmonic leakage.  preset_cheaper
        # defaults split=True (like the C++ preset) — comparing that against
        # a non-split oracle render was this test's long-standing phantom
        # "mapped-path defect" (the engines agree to ~0.001 dB envelope when
        # modes match).
        s.preset_cheaper(1, rate, split_computation=False)
        s.set_transpose_semitones(case["semitones"],
                                  case["tonality"] / rate)
        out, ok = s.exact(sig, out_len)
        out = np.asarray(out)
        assert ok and out.shape == ref.shape

        # band-energy distance (log10).  With matched split modes the
        # engines agree to <= 0.002 log10 across all kinds/cases (measured);
        # mapped gates get a chaos-relative term because the phase recursion
        # reshuffles inter-harmonic leakage (the oracle's own 1-ulp input
        # sensitivity bounds what is chaos-legal).  A real frequency-map
        # defect shifts whole harmonics by tens of dB and clears any gate
        # here by orders of magnitude.
        be_mine = band_energies(out, rate)
        be_ref = band_energies(ref, rate)
        err = np.abs(be_mine - be_ref).max()
        if case["semitones"] == 0.0:
            tol = 0.05
        else:
            pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
            ref_p = run_oracle(oracle_bin, str(tmp_path), pert, rate,
                               time_f=case["time_f"],
                               semitones=case["semitones"],
                               tonality=case["tonality"], cheaper=True,
                               split=False)
            chaos = np.abs(band_energies(ref_p, rate) - be_ref).max()
            tol = max(0.03, 3.0 * chaos + 0.01)
        assert err < tol, (kind, case, err, tol)

        # broadband envelope: 50 ms RMS windows.  Measured parity is
        # <= 0.018 dB with matched modes; 0.1 dB catches any placement or
        # coherence regression (a one-interval misplacement reads ~1 dB).
        env_db = envelope_db(out, ref, rate)
        assert env_db < 0.1, (kind, case, env_db)

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
            # gate is chaos-relative like test_parity_exact: the phase
            # recursion amplifies ulp-level differences exponentially along
            # the render (measured: the harmonic clip's 1-ulp chaos grows
            # -113 -> -62 dB over 15k samples).  Our per-op f32 reordering
            # acts as a few-ulp perturbation at every block; with matched
            # split modes ours-vs-oracle tracks the 1-ulp chaos curve
            # within a few dB, so 12 dB headroom is ample.  A real defect
            # clears this by tens of dB.
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
