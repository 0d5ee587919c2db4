#!/usr/bin/env python
"""Corpus sweep runner: the cmd/Makefile:12-33 grid, gated against the oracle.

The reference sweeps a corpus of inputs across +-2/4/8/16 semitones and
0.8x-4x time factors (`make examples`) and eyeballs the outputs; here the
same grid runs both engines and emits a machine-checkable pass/fail table
using the docs/PARITY.md gate taxonomy:

  - band-energy envelopes (log10 third-octave, structural) per clip+case;
  - broadband RMS envelope deviation (dB);
  - sample-level chaos-relative gate (vs the oracle's own 1-ulp
    sensitivity) for unmapped time factors <= 2, cut clear of the
    RNG-divergent flush tail (--samples to enable; doubles oracle renders).

Usage:
    python tools/sweep_corpus.py [--inputs DIR] [--rate 8000] [--seconds 2]
        [--samples] [--json out.json] [--quick]

Without --inputs, a deterministic 4-clip synthetic corpus is used
(signalsmith_stretch_tpu.utils.evaluation, pinned seeds).
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from signalsmith_stretch_tpu.utils.evaluation import (
    KINDS, band_energies, envelope_db, synth_clip)

# the reference's grid (cmd/Makefile:12-33): semitone sweep at time=1,
# time sweep at semitones=0; the dev target (:28-33) adds formant
# permutations — formant-compensated transposes and plain formant shifts
SEMITONE_CASES = [2, -2, 4, -4, 8, -8, 16, -16]
TIME_CASES = [0.8, 1.2, 1.5, 2.0, 4.0]
FORMANT_CASES = [  # (semitones, formant_semitones, formant_comp)
    (4, 0.0, True), (-4, 0.0, True), (8, 0.0, True),
    (0, 3.0, False), (0, -3.0, False), (5, 3.0, True),
]

# gate taxonomy (docs/PARITY.md): unmapped band energies are tight; mapped /
# randomized renders reshuffle inter-harmonic leakage through the chaotic
# phase recursion and the RNG-divergent flush tail
BAND_GATE_UNMAPPED = 0.05   # log10 (~0.5 dB/band)
BAND_GATE_MAPPED = 0.05     # matched split modes agree to <=0.002 measured
BAND_GATE_RANDOM = 0.30     # >2x stretch: phases are drawn from different RNGs
ENV_GATE_DB = 0.1           # measured parity <=0.018 dB with matched modes
ENV_GATE_RANDOM_DB = 1.0


def rel_err_db(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return 10 * np.log10(np.mean((a - b) ** 2) / (np.mean(b ** 2) + 1e-30)
                         + 1e-30)


def run_oracle(oracle_bin, tmpdir, sig, rate, **kw):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from conftest import run_oracle as ro
    return ro(oracle_bin, tmpdir, sig, rate, **kw)


def load_corpus(args):
    if args.inputs:
        from signalsmith_stretch_tpu.io import read_wav
        corpus = []
        for name in sorted(os.listdir(args.inputs)):
            if name.lower().endswith(".wav"):
                audio, rate = read_wav(os.path.join(args.inputs, name))
                corpus.append((os.path.splitext(name)[0], audio[:1], rate))
        if not corpus:
            raise SystemExit(f"no .wav files in {args.inputs}")
        return corpus
    return [(kind, synth_clip(kind, args.rate, args.seconds), args.rate)
            for kind in KINDS]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", help="directory of .wav inputs (default: "
                   "synthetic 4-clip corpus)")
    p.add_argument("--rate", type=int, default=8000)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--samples", action="store_true",
                   help="also run chaos-relative sample gates (2x oracle cost)")
    p.add_argument("--json", help="write results as JSON")
    p.add_argument("--quick", action="store_true",
                   help="only +-2/+-8 semitones and 0.8/1.2/4.0 times")
    p.add_argument("--oracle", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "oracle", "oracle"))
    args = p.parse_args()

    if not os.path.exists(args.oracle):
        raise SystemExit(f"oracle binary missing: {args.oracle} (cd oracle && make)")

    from signalsmith_stretch_tpu.api import SignalsmithStretch

    corpus = load_corpus(args)
    semis = [2, -2, 8, -8] if args.quick else SEMITONE_CASES
    times = [0.8, 1.2, 4.0] if args.quick else TIME_CASES
    formants = ([(4, 0.0, True), (0, 3.0, False)] if args.quick
                else FORMANT_CASES)
    cases = ([dict(time_f=1.0, semitones=float(s)) for s in semis]
             + [dict(time_f=t, semitones=0.0) for t in times]
             + [dict(time_f=1.0, semitones=float(s), formant=float(f),
                     formant_comp=fc) for s, f, fc in formants])

    tmp = tempfile.mkdtemp()
    rows = []
    failures = 0
    t_start = time.time()
    for case in cases:
        tf, st = case["time_f"], case["semitones"]
        fsemi = case.get("formant", 0.0)
        fcomp = case.get("formant_comp", False)
        mapped = st != 0.0 or fsemi != 0.0
        randomized = tf > 2.0
        band_gate = (BAND_GATE_RANDOM if randomized
                     else BAND_GATE_MAPPED if mapped else BAND_GATE_UNMAPPED)
        env_gate = ENV_GATE_RANDOM_DB if randomized else ENV_GATE_DB
        for name, sig, rate in corpus:
            out_len = int(round(sig.shape[1] * tf))
            ref = run_oracle(args.oracle, tmp, sig, rate, time_f=tf,
                             semitones=st, cheaper=True, split=False,
                             formant=fsemi, formant_comp=fcomp)
            s = SignalsmithStretch()
            # must match the oracle's (non-split) mode: split shifts block
            # output placement by one interval (see tests/test_corpus_stats)
            s.preset_cheaper(1, rate, split_computation=False)
            if st != 0.0:
                s.set_transpose_semitones(st)
            if fsemi != 0.0 or fcomp:
                s.set_formant_semitones(fsemi, compensate_pitch=fcomp)
            out, ok = s.exact(sig, out_len)
            out = np.asarray(out)
            checks = {}
            ref2 = None
            if args.samples:
                # the oracle's own sensitivity as the yardstick: a 1-ulp
                # input perturbation inside the clean regime, a different
                # RNG seed in the randomized (>2x) regime (there the two
                # implementations draw different streams BY DESIGN, so
                # seed-to-seed distance is the meaningful floor)
                if randomized:
                    ref2 = run_oracle(args.oracle, tmp, sig, rate, time_f=tf,
                                      semitones=st, cheaper=True, split=False,
                                      formant=fsemi, formant_comp=fcomp,
                                      seed=2)
                else:
                    pert = np.nextafter(
                        sig, np.float32(np.inf)).astype(np.float32)
                    ref2 = run_oracle(args.oracle, tmp, pert, rate, time_f=tf,
                                      semitones=st, cheaper=True, split=False,
                                      formant=fsemi, formant_comp=fcomp)
            if not ok or out.shape != ref.shape:
                checks["shape"] = (False, "render failed")
            else:
                bg, eg = band_gate, env_gate
                if ref2 is not None:
                    # chaos-relative floors: extreme maps (|st|=16) and long
                    # stretches push the oracle's own 1-ulp/seed sensitivity
                    # above the static gates — gate 1.5x above it instead
                    bch = float(np.abs(band_energies(ref2, rate)
                                       - band_energies(ref, rate)).max())
                    ech = envelope_db(ref2, ref, rate)
                    bg = max(bg, 1.5 * bch + 0.01)
                    eg = max(eg, 1.5 * ech + 0.02)
                be = float(np.abs(band_energies(out, rate)
                                  - band_energies(ref, rate)).max())
                checks["band"] = (be < bg, f"{be:.3f}<{bg:.3g}")
                ed = envelope_db(out, ref, rate)
                checks["env"] = (ed < eg, f"{ed:.2f}dB<{eg:.3g}")
                if args.samples and not mapped and tf <= 2.0:
                    # chaos-relative sample gate, clear of the flush tail
                    # (docs/PARITY.md "flush tail is RNG-divergent")
                    cut = out.shape[1] - 4 * (s.block_samples()
                                              + s.interval_samples())
                    # 26 dB headroom over the 1-ulp chaos probe.  The probe
                    # seeds ONE dense ulp-scale perturbation at the input;
                    # ours-vs-oracle re-injects fma/reassociation noise at
                    # EVERY block of the output-phase feedback, which on the
                    # worst modulated clip (vibrato, t=1.5) measured 15-21 dB
                    # above the probe's curve — with the wavefront and the
                    # reference-order scan engine agreeing to 0.1 dB (so the
                    # gap is ordering noise, not an engine defect; each
                    # stage is separately bit-gated per block by
                    # tests/test_probe_parity).  26 leaves ~5 dB regression
                    # margin on that clip.
                    gate = max(-60.0,
                               rel_err_db(ref2[:, :cut], ref[:, :cut]) + 26.0)
                    db = rel_err_db(out[:, :cut], ref[:, :cut])
                    checks["samples"] = (db < gate, f"{db:.1f}dB<{gate:.1f}")
            ok_all = all(v for v, _ in checks.values())
            failures += not ok_all
            detail = " ".join(f"{k}:{d}{'' if v else ' FAIL'}"
                              for k, (v, d) in checks.items())
            rows.append(dict(clip=name, time=tf, semitones=st,
                             formant=fsemi, formant_comp=fcomp,
                             ok=ok_all, detail=detail))
            fdesc = f" f={fsemi:+.0f}{'c' if fcomp else ''}" if (
                fsemi or fcomp) else ""
            print(f"{'PASS' if ok_all else 'FAIL'}  t={tf:<4} st={st:<5}"
                  f"{fdesc} {name:12s} {detail}", flush=True)

    n = len(rows)
    print(f"\n{n - failures}/{n} passed in {time.time() - t_start:.0f}s")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(rows=rows, passed=n - failures, total=n), f,
                      indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
