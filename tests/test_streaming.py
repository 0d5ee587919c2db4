"""Streaming engine parity + invariants (process/seek/flush, silence, state).

The flush tail after a zero-rate flush enters the reference's randomized-phase
regime (timeFactor = interval/leftover > 2, signalsmith-stretch.h:312,639),
so gates cover the deterministic main region; the tail is checked
structurally.
"""
import numpy as np
import pytest

from conftest import rel_err_db, run_oracle

from signalsmith_stretch_tpu import spectral
from signalsmith_stretch_tpu.config import StretchConfig
from signalsmith_stretch_tpu.streaming import StreamingStretch


def _stream_render(sig, rate, chunk, time_f=1.0, seed=1):
    cfg = StretchConfig.preset_cheaper(sig.shape[0], rate, False)
    controls = spectral.Controls.make()
    flags = spectral.SpectralFlags(False, False, False)
    s = StreamingStretch(cfg, controls, flags, seed=seed)
    in_lat = cfg.input_latency
    L = sig.shape[1]
    Lout = int(round(L * time_f))
    pad = np.concatenate([sig, np.zeros((sig.shape[0], in_lat), np.float32)], 1)
    s.seek(pad[:, :in_lat], 1.0 / time_f)
    outs, done, in_done = [], 0, 0
    while done < Lout:
        n = min(chunk, Lout - done)
        in_target = min(int(round((done + n) * L / Lout)), L)
        outs.append(s.process(pad[:, in_lat + in_done:in_lat + in_target], n))
        in_done = in_target
        done += n
    tail = cfg.output_latency + cfg.input_latency
    outs.append(s.flush(tail))
    return np.concatenate(outs, 1), cfg


def test_stream_identity_parity(oracle_bin, test_signal, tmp_path):
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="stream",
                     chunk=512)
    out, cfg = _stream_render(sig, rate, chunk=512)
    assert out.shape == ref.shape
    L = sig.shape[1]  # deterministic region: everything before the flush tail
    db = rel_err_db(out[:, :L], ref[:, :L])
    assert db < -60, db


def test_stream_chunk_size_parity(oracle_bin, test_signal, tmp_path):
    """Different chunkings match the oracle with the same chunking."""
    sig, rate = test_signal
    for chunk in (160, 1024):
        ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="stream",
                         chunk=chunk)
        out, _ = _stream_render(sig, rate, chunk=chunk)
        L = sig.shape[1]
        db = rel_err_db(out[:, :L], ref[:, :L])
        assert db < -60, (chunk, db)


def test_stream_matches_own_single_call(test_signal):
    """Call-splitting invariance within this implementation (cmd/main-dev.cpp:146)."""
    sig, rate = test_signal
    a, _ = _stream_render(sig, rate, chunk=sig.shape[1])
    b, _ = _stream_render(sig, rate, chunk=320)  # exactly one interval per call
    L = sig.shape[1]
    db = rel_err_db(a[:, :L], b[:, :L])
    assert db < -60, db


def test_silence_bypass(test_signal):
    """>= 2*block of silence switches to passthrough with state flush (:240-278)."""
    sig, rate = test_signal
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    controls = spectral.Controls.make()
    flags = spectral.SpectralFlags(False, False, False)
    s = StreamingStretch(cfg, controls, flags)
    s.seek(sig[:, :cfg.input_latency], 1.0)
    _ = s.process(sig[:, :4000], 4000)
    silence = np.zeros((1, 2 * cfg.block_samples + 100), np.float32)
    _ = s.process(silence, silence.shape[1])
    # now in bypass: output is a verbatim wrap-around copy of the input
    # (probe energy must stay below the 1e-15 noise floor, :240)
    probe = (np.arange(500, dtype=np.float32) * 1e-12)[None, :]
    out = s.process(probe, 700)
    expect = probe[:, np.arange(700) % 500]
    np.testing.assert_allclose(out, expect, atol=0)


def test_state_checkpoint_resume(test_signal):
    """State is an explicit pytree: save/restore mid-stream continues identically."""
    sig, rate = test_signal
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    controls = spectral.Controls.make()
    flags = spectral.SpectralFlags(False, False, False)
    s = StreamingStretch(cfg, controls, flags, seed=3)
    s.seek(sig[:, :cfg.input_latency], 1.0)
    _ = s.process(sig[:, :4000], 4000)
    snap = s.state_dict()
    a = s.process(sig[:, 4000:8000], 4000)

    s2 = StreamingStretch(cfg, controls, flags, seed=99)
    s2.load_state_dict(snap)
    b = s2.process(sig[:, 4000:8000], 4000)
    np.testing.assert_array_equal(a, b)


def test_latency_semantics(test_signal):
    """After seek(inputLatency), streamed output is the input delayed by
    outputLatency (cmd/main-dev.cpp:143-152 recipe; verified against the
    oracle's stream mode alignment)."""
    sig, rate = test_signal
    out, cfg = _stream_render(sig, rate, chunk=512)
    lat = cfg.output_latency
    sl = slice(8000, 20000)
    db = rel_err_db(out[:, sl.start + lat:sl.stop + lat], sig[:, sl])
    assert db < -55, db


def test_api_streaming_surface(oracle_bin, test_signal, tmp_path):
    """The single-object API (preset + setters + seek/process/flush) matches
    the oracle's stream mode, like the dev harness drives it."""
    import signalsmith_stretch_tpu as sst
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="stream",
                     chunk=512)
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    in_lat = s.input_latency()
    pad = np.concatenate([sig, np.zeros((1, in_lat), np.float32)], 1)
    s.seek(pad[:, :in_lat], 1.0)
    outs, done = [], 0
    L = sig.shape[1]
    while done < L:
        n = min(512, L - done)
        outs.append(s.process(pad[:, in_lat + done:in_lat + done + n], n))
        done += n
    outs.append(s.flush(s.output_latency() + in_lat))
    out = np.concatenate(outs, 1)
    db = rel_err_db(out[:, :L], ref[:, :L])
    assert db < -60, db


def test_api_output_seek_alignment(test_signal):
    """outputSeek pre-rolls so the next process() output aligns with the
    start of the supplied audio (reference :170-204)."""
    import signalsmith_stretch_tpu as sst
    sig, rate = test_signal
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    seek_len = s.output_seek_length(1.0)
    s.output_seek(sig[:, :seek_len])
    out = s.process(sig[:, seek_len:seek_len + 4000], 4000)
    sl = slice(1000, 3800)
    db = rel_err_db(out[:, sl], sig[:, sl])
    assert db < -40, db


def test_api_staged_mode_parity(oracle_bin, test_signal, tmp_path):
    """The documented offline recipe (cmd/main.cpp:56-83) through the
    single-object API: outputSeek -> process -> flush vs the oracle's staged
    mode."""
    import signalsmith_stretch_tpu as sst
    sig, rate = test_signal
    time_f = 1.0
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="staged",
                     time_f=time_f)
    s = sst.SignalsmithStretch(seed=1)
    s.preset_cheaper(1, rate, False)
    L = sig.shape[1]
    out_len = int(round(L * time_f))
    seek_len = s.output_seek_length(1.0 / time_f)
    s.output_seek(sig[:, :seek_len])
    out_index = out_len - s.interval_samples()
    out_pos = out_index + s.output_latency()
    in_pos = int(round(out_pos / time_f))
    in_index = in_pos + s.input_latency()
    pad = np.concatenate(
        [sig, np.zeros((1, max(0, in_index - L)), np.float32)], 1)
    main = s.process(pad[:, seek_len:in_index], out_index)
    tail = s.flush(out_len - out_index)
    out = np.concatenate([main, tail], 1)
    assert out.shape == ref.shape
    db = rel_err_db(out[:, :out_index], ref[:, :out_index])
    assert db < -60, db


def test_stream_rate_parity(oracle_bin, test_signal, tmp_path):
    """Streaming at a non-unity rate (time-stretch 1.25x) matches the oracle
    stream mode."""
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="stream",
                     chunk=512, time_f=1.25)
    out, cfg = _stream_render(sig, rate, chunk=512, time_f=1.25)
    n = min(out.shape[1], ref.shape[1]) - (cfg.output_latency
                                           + cfg.input_latency)
    db = rel_err_db(out[:, :n], ref[:, :n])
    assert db < -50, db


def test_stream_extreme_compression_parity(oracle_bin, test_signal, tmp_path):
    """8x time-compression engages the reference's copyInput skip path
    (signalsmith-stretch.h:215-229: per-block input jumps > block+interval drop
    older ring history).  The linear-timeline streaming engine needs no special
    casing: analysis frames reach back at most block+interval from the block's
    input offset, so they never read the dropped region — both engines always
    see true input, and outputs match.  (cheaper@8kHz: cap/H = 5, so rate 8
    is firmly in the skip regime.)"""
    sig, rate = test_signal
    ref = run_oracle(oracle_bin, str(tmp_path), sig, rate, mode="stream",
                     chunk=512, time_f=0.125)
    out, cfg = _stream_render(sig, rate, chunk=512, time_f=0.125)
    n = min(out.shape[1], ref.shape[1]) - (cfg.output_latency
                                           + cfg.input_latency)
    db = rel_err_db(out[:, :n], ref[:, :n])
    assert db < -50, db
