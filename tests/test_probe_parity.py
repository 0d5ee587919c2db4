"""Stage-level parity vs the reference engine's *internals* (oracle/probe.cpp).

The probe drives the unmodified reference header one block per process() call
and dumps its private per-block state (energy, smoothedEnergy, outputMap,
prediction energies, freqEstimateWeighted).  Here the integrated wavefront
planner (wavefront.plan_spectral debug mode) is compared against those dumps
block by block — a direct check of each analysis-side chain, far tighter than
output-level parity because these quantities are analysis-derived and
therefore NOT subject to the algorithm's chaotic phase feedback
(docs/PARITY.md).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from conftest import REPO, rel_err_db, write_raw
from signalsmith_stretch_tpu import engine, stft, wavefront
from signalsmith_stretch_tpu.api import SignalsmithStretch

PROBE = os.path.join(REPO, "oracle", "probe")
PROBE2 = os.path.join(REPO, "oracle", "probe2")

# probe.cpp dump tags
T_ENERGY, T_SMOOTHED, T_INPUT_BIN, T_FREQ_GRAD = 1, 2, 3, 4
T_PEAK_IN, T_PEAK_OUT, T_PRED_ENERGY = 5, 6, 7
T_BAND_IN_ENERGY, T_OUT_RE, T_OUT_IM, T_FREQ_EST_W = 8, 9, 10, 11


@pytest.fixture(scope="session")
def probe_bin():
    if not os.path.exists(PROBE):
        subprocess.run(["make", "probe"], cwd=os.path.join(REPO, "oracle"),
                       check=True)
    return PROBE


def parse_dump(path):
    """[{tag: np.ndarray}] — one dict per dumped block (tag 1 starts a block)."""
    blocks = []
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                break
            tag, count = struct.unpack("<II", head)
            data = np.frombuffer(f.read(4 * count), dtype="<f4")
            if tag == T_ENERGY:
                blocks.append({})
            blocks[-1][tag] = data
    return blocks


def run_probe(probe_bin, tmpdir, sig, rate, time_f=1.0, semitones=0.0,
              tonality=0.0, formant=0.0, formant_comp=False, seed=1,
              cheaper=True):
    inp = os.path.join(tmpdir, "probe_in.raw")
    outp = os.path.join(tmpdir, "probe_out.raw")
    dump = os.path.join(tmpdir, "probe_dump.bin")
    write_raw(inp, sig, rate)
    args = [probe_bin, inp, outp, dump, f"--time={time_f}",
            f"--semitones={semitones}", f"--tonality={tonality}",
            f"--formant={formant}", f"--seed={seed}"]
    if formant_comp:
        args.append("--formant-comp")
    if not cheaper:
        args.append("--default")
    subprocess.run(args, check=True)
    return parse_dump(dump)


def plan_debug(sig, rate, semitones=0.0, tonality_hz=0.0, formant=0.0,
               formant_comp=False, seed=1, cheaper=True, time_f=1.0):
    """The framework side: exact()'s planner intermediates + main-block range.

    Mirrors engine.render_exact's analysis stage (frame gather + modified FFT)
    and runs the batched planner in debug mode.  Returns (dbg, n_pre, n_main):
    schedule blocks [n_pre, n_pre+n_main) correspond 1:1 with the probe's
    main-loop dumps (the probe chunks the main process into one-block calls).
    """
    import jax.numpy as jnp

    s = SignalsmithStretch()
    # probe.cpp runs WITHOUT split computation; split only delays output
    # placement but shifts seekLength by one interval, which would misalign
    # the block numbering below.
    if cheaper:
        s.preset_cheaper(sig.shape[0], rate, split_computation=False)
    else:
        s.preset_default(sig.shape[0], rate)
    s.set_transpose_semitones(semitones, tonality_hz / rate)
    if formant or formant_comp:
        s.set_formant_semitones(formant, formant_comp)
    cfg, controls, flags = s._cfg, s._controls(), s._flags()

    L = sig.shape[1]
    plan = engine.build_exact_plan(cfg, L, int(round(L * time_f)))
    timeline = np.asarray(engine._build_timeline(jnp.asarray(sig), plan))

    block = cfg.block_samples
    frames = np.zeros((plan.frame_idx.shape[0], sig.shape[0], block),
                      np.float32)
    for i, s0 in enumerate(plan.frame_idx[:, 0].tolist()):
        lo = max(s0, 0)
        frames[i, :, lo - s0:] = timeline[:, lo:s0 + block]
    spectra = stft.analyze(jnp.asarray(frames), plan.basis)
    prev_spectra = jnp.zeros_like(spectra)
    if plan.re_rows.size:   # seek block reanalyses one interval back (:335)
        re_frames = np.zeros((plan.re_frame_idx.shape[0], sig.shape[0], block),
                             np.float32)
        for i, s0 in enumerate(plan.re_frame_idx[:, 0].tolist()):
            lo = max(s0, 0)
            re_frames[i, :, lo - s0:] = timeline[:, lo:s0 + block]
        prev_spectra = prev_spectra.at[jnp.asarray(plan.re_rows)].set(
            stft.analyze(jnp.asarray(re_frames), plan.basis))

    _, dbg = wavefront.plan_spectral(spectra, prev_spectra, plan.arrays,
                                     controls, flags, plan.consts, seed,
                                     debug=True)
    dbg = {k: np.asarray(v) for k, v in dbg.items()}

    H = cfg.interval_samples
    n_pre = -(-plan.sched.preroll_len // H)     # blocks fired during outputSeek
    n_main = plan.sched.main_out // H           # full chunks => one dump each
    return dbg, n_pre, n_main


def test_probe_mapped_chain(probe_bin, test_signal, tmp_path):
    """energy -> smoothedEnergy -> outputMap -> prediction energies, per block,
    against the reference's own internals (signalsmith-stretch.h:816-917,
    :697-719) for a pitch-shifted render."""
    sig, rate = test_signal
    dumps = run_probe(probe_bin, str(tmp_path), sig, rate, semitones=3)
    dbg, n_pre, n_main = plan_debug(sig, rate, semitones=3)
    n = min(n_main, len(dumps))
    assert n >= 50
    B = dbg["energy"].shape[1]

    for i in range(n):
        k = n_pre + i
        ref = dumps[i]
        assert rel_err_db(dbg["energy"][k], ref[T_ENERGY][:B]) < -80, i
        assert rel_err_db(dbg["smoothed"][k], ref[T_SMOOTHED][:B]) < -80, i
        # outputMap: inputBin positions and gradients (piecewise-linear map
        # from detected peaks; threshold decisions could flip a bin on ulp-
        # level energy differences, so require near-everywhere agreement)
        ib_err = np.abs(dbg["input_bin"][k] - ref[T_INPUT_BIN][:B])
        fg_err = np.abs(dbg["freq_grad"][k] - ref[T_FREQ_GRAD][:B])
        assert np.mean(ib_err < 1e-3) > 0.999, (i, ib_err.max())
        assert np.mean(fg_err < 1e-3) > 0.999, (i, fg_err.max())
        # preliminary prediction energies (Prediction.energy, :697-719)
        pe = dbg["pe"][k].reshape(-1)
        assert rel_err_db(pe, ref[T_PRED_ENERGY][:pe.size]) < -70, i


def test_probe_identity_prediction_energy(probe_bin, test_signal, tmp_path):
    """Unmapped path: prediction energies == band energies (no gathers)."""
    sig, rate = test_signal
    dumps = run_probe(probe_bin, str(tmp_path), sig, rate, semitones=0)
    import jax.numpy as jnp  # noqa: F401

    s = SignalsmithStretch()
    s.preset_cheaper(sig.shape[0], rate, split_computation=False)
    cfg, controls, flags = s._cfg, s._controls(), s._flags()
    L = sig.shape[1]
    plan = engine.build_exact_plan(cfg, L, L)
    import jax.numpy as jnp
    timeline = np.asarray(engine._build_timeline(jnp.asarray(sig), plan))
    block = cfg.block_samples
    frames = np.zeros((plan.frame_idx.shape[0], sig.shape[0], block),
                      np.float32)
    for i, s0 in enumerate(plan.frame_idx[:, 0].tolist()):
        lo = max(s0, 0)
        frames[i, :, lo - s0:] = timeline[:, lo:s0 + block]
    spectra = stft.analyze(jnp.asarray(frames), plan.basis)
    sweep = wavefront.plan_spectral(spectra, jnp.zeros_like(spectra),
                                    plan.arrays, controls, flags,
                                    plan.consts, 1)
    pe = np.stack([np.asarray(x) for x in sweep.pe], axis=1)  # [nB, ch, B]

    H = cfg.interval_samples
    n_pre = -(-plan.sched.preroll_len // H)
    n = min(plan.sched.main_out // H, len(dumps))
    assert n >= 50
    for i in range(n):
        ref_pe = dumps[i][T_PRED_ENERGY]
        mine = pe[n_pre + i].reshape(-1)
        assert rel_err_db(mine, ref_pe[:mine.size]) < -80, i


def test_probe_mapped_chain_default_preset(probe_bin, test_signal, tmp_path):
    """Same chain checks under the default preset (larger block/interval,
    tonality limit active) — different smoothing constants, rotor, and map
    clamping than the cheaper preset."""
    sig, rate = test_signal
    dumps = run_probe(probe_bin, str(tmp_path), sig, rate, semitones=3,
                      tonality=2000, cheaper=False)
    dbg, n_pre, n_main = plan_debug(sig, rate, semitones=3, tonality_hz=2000,
                                    cheaper=False)
    n = min(n_main, len(dumps))
    assert n >= 20
    B = dbg["energy"].shape[1]
    for i in range(n):
        k = n_pre + i
        ref = dumps[i]
        assert rel_err_db(dbg["energy"][k], ref[T_ENERGY][:B]) < -80, i
        assert rel_err_db(dbg["smoothed"][k], ref[T_SMOOTHED][:B]) < -80, i
        ib_err = np.abs(dbg["input_bin"][k] - ref[T_INPUT_BIN][:B])
        assert np.mean(ib_err < 1e-3) > 0.999, (i, ib_err.max())
        pe = dbg["pe"][k].reshape(-1)
        assert rel_err_db(pe, ref[T_PRED_ENERGY][:pe.size]) < -70, i


@pytest.fixture(scope="session")
def probe2_bin():
    if not os.path.exists(PROBE2):
        subprocess.run(["make", "probe2"], cwd=os.path.join(REPO, "oracle"),
                       check=True)
    return PROBE2


def test_probe2_exact_grid_mapped_stretch(probe2_bin, tmp_path):
    """Per-block parity on the TRUE exact() block grid for a combined
    time-stretch + pitch-shift render (probe2.cpp: the profiling-macro hook
    dumps from a SINGLE process() call, so the grid carries the pre-roll's
    samplesSinceLast offset — outputLatency % interval != 0 shifts every
    main block, which probe.cpp's interval-chunked calls cannot reproduce).

    This is the regime (reanalyse every block + frequency map active) where
    a split-mode comparison mismatch masqueraded as a mapped-path defect for
    two rounds; the analysis chain must be bit-tight on every block."""
    from signalsmith_stretch_tpu.utils.evaluation import synth_clip
    rate = 8000
    sig = synth_clip("transients", rate, 2.0)
    dumps = run_probe(probe2_bin, str(tmp_path), sig, rate, time_f=1.2,
                      semitones=-4.0, tonality=3000.0)
    dbg, n_pre, n_main = plan_debug(sig, rate, semitones=-4.0,
                                    tonality_hz=3000.0, time_f=1.2)
    n = min(n_main, len(dumps))
    assert n >= 50
    B = dbg["energy"].shape[1]
    for i in range(n):
        k = n_pre + i
        ref = dumps[i]
        assert rel_err_db(dbg["energy"][k], ref[T_ENERGY][:B]) < -100, i
        assert rel_err_db(dbg["smoothed"][k], ref[T_SMOOTHED][:B]) < -100, i
        ib_err = np.abs(dbg["input_bin"][k] - ref[T_INPUT_BIN][:B])
        assert np.mean(ib_err < 1e-3) > 0.9999, (i, ib_err.max())
        pe = dbg["pe"][k].reshape(-1)
        assert rel_err_db(pe, ref[T_PRED_ENERGY][:pe.size]) < -90, i


def test_probe_formant_freq_estimate(probe_bin, test_signal, tmp_path):
    """freqEstimateWeighted IIR chain (:962-965) matches the reference's
    member value per block under auto formant tracking."""
    sig, rate = test_signal
    dumps = run_probe(probe_bin, str(tmp_path), sig, rate, formant=2)
    dbg, n_pre, n_main = plan_debug(sig, rate, formant=2)
    n = min(n_main, len(dumps))
    assert n >= 50
    mine = dbg["freq_estimate_weighted"]
    ref = np.array([d[T_FREQ_EST_W][0] for d in dumps[:n]])
    assert rel_err_db(mine[n_pre:n_pre + n], ref) < -70
