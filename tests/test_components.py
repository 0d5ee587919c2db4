"""Component tests: scheduler node, corpus pipeline, model facade, native IO,
dev CLI."""
import os

import numpy as np
import pytest

from signalsmith_stretch_tpu.config import StretchConfig


def test_stretch_node_buffer_playback(test_signal):
    """Scheduler analogue of the worklet buffer mode (web-wrapper.js:267-322):
    schedule a segment over stored buffers and render pitch-shifted audio."""
    from signalsmith_stretch_tpu.scheduler import StretchNode
    sig, rate = test_signal
    node = StretchNode(rate, channels=1, preset="cheaper", quantum=400)
    node.add_buffers(sig)
    assert node.buffer_seconds == pytest.approx(3.0, abs=0.01)
    node.schedule(input=0.5, rate=1.0, semitones=12.0, tonality_hz=2000)
    out = node.render(0.5)
    assert out.shape == (1, int(0.5 * rate))
    # steady region should contain the octave-shifted fundamental (220 Hz)
    seg = out[0, 1600:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / rate)
    peak = freqs[np.argmax(spec)]
    assert 195 < peak < 245, peak


def test_stretch_node_stop_and_updates(test_signal):
    from signalsmith_stretch_tpu.scheduler import StretchNode
    sig, rate = test_signal
    node = StretchNode(rate, channels=1, preset="cheaper", quantum=320)
    node.add_buffers(sig)
    times = []
    node.set_update_interval(0.1, times.append)
    node.schedule(input=0.0, rate=1.0)
    _ = node.render(0.2)
    node.stop()
    out = node.render(0.2)
    assert np.all(out == 0)          # inactive segment renders silence
    assert len(times) >= 2           # time feedback fired
    lat = node.latency()
    assert lat["input"] > 0 and lat["output"] > 0


def test_stretch_node_loop(test_signal):
    from signalsmith_stretch_tpu.scheduler import Segment
    seg = Segment(input=0.0, output=0.0, rate=1.0, loop_start=0.5,
                  loop_end=1.0)
    assert seg.input_at(0.25) == pytest.approx(0.25)
    assert seg.input_at(0.75) == pytest.approx(0.75)
    assert seg.input_at(1.25) == pytest.approx(0.75)   # wrapped
    assert seg.input_at(2.3) == pytest.approx(0.8, abs=1e-6)


def test_corpus_bucketing(tmp_path, test_signal):
    from signalsmith_stretch_tpu.io import write_wav
    from signalsmith_stretch_tpu.io.corpus import (CorpusItem, batches,
                                                   bucket, load_directory)
    sig, rate = test_signal
    paths = []
    for i, n in enumerate([8000, 9000, 16000, 16500]):
        p = str(tmp_path / f"clip{i}.wav")
        write_wav(p, sig[:, :n], rate)
        paths.append(p)
    items = load_directory(paths, time_factor=1.25)
    b = bucket(items, granule_seconds=1.0)
    assert len(b) == 3               # pads 8000 / 16000(x2) / 24000
    got = list(batches(items, batch_size=2, prefetch=0))
    assert sum(x["audio"].shape[0] for x in got) == 4
    peak, rms, te = items[0].stats()
    assert 0 < rms < peak


def test_native_io_roundtrip(tmp_path, test_signal):
    pytest.importorskip("signalsmith_stretch_tpu._sstio")
    from signalsmith_stretch_tpu.io import read_wav, write_wav
    sig, rate = test_signal
    p = str(tmp_path / "t.wav")
    write_wav(p, sig[:, :5000], rate)
    back, r = read_wav(p)
    assert r == rate
    # 16-bit PCM: half-step quantization + the 32767/32768 scale asymmetry
    assert np.abs(back - np.clip(sig[:, :5000], -1, 1)).max() < 6e-5


def test_stretch_model_batched(test_signal):
    from signalsmith_stretch_tpu.models import StretchModel
    sig, rate = test_signal
    model = StretchModel.build(channels=1, sample_rate=rate, in_samples=8000,
                               out_samples=10000, semitones=2.0,
                               tonality_hz=2000, cheaper=True)
    batch = np.stack([sig[:, :8000], sig[:, 1000:9000]])
    out = np.asarray(model.batched(batch))
    assert out.shape == (2, 1, 10000)
    assert np.all(np.isfinite(out))


def test_cli_dev_golden_regression(tmp_path, test_signal):
    from signalsmith_stretch_tpu.cli_dev import main as dev_main
    from signalsmith_stretch_tpu.io import write_raw
    sig, rate = test_signal
    inp = str(tmp_path / "in.raw")
    outp = str(tmp_path / "out.raw")
    write_raw(inp, sig[:, :8000], rate)
    args = [inp, outp, "--raw", "--cheaper", "--time=1.25", "--seed=1"]
    assert dev_main(args) == 0          # snapshots the reference
    assert os.path.exists(outp + ".reference.npy")
    assert dev_main(args) == 0          # second run passes the -60 dB gate


def test_checkpoint_save_load(tmp_path, test_signal):
    """Stream state survives an npz round trip and resumes identically."""
    from signalsmith_stretch_tpu import spectral
    from signalsmith_stretch_tpu.streaming import StreamingStretch
    from signalsmith_stretch_tpu.utils import checkpoint
    sig, rate = test_signal
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    s = StreamingStretch(cfg, spectral.Controls.make(),
                         spectral.SpectralFlags(False, False, False), seed=4)
    s.seek(sig[:, :cfg.input_latency], 1.0)
    _ = s.process(sig[:, :4000], 4000)
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, s.state)
    a = s.process(sig[:, 4000:8000], 4000)

    s2 = StreamingStretch(cfg, spectral.Controls.make(),
                          spectral.SpectralFlags(False, False, False), seed=9)
    s2.state = checkpoint.load(path, s2.state)
    b = s2.process(sig[:, 4000:8000], 4000)
    np.testing.assert_array_equal(a, b)


def test_mixed_corpus_end_to_end(tmp_path, test_signal):
    """BASELINE #5 shape: a mixed-settings corpus through the bucketed batch
    pipeline matches per-clip exact() renders."""
    import jax.numpy as jnp
    from signalsmith_stretch_tpu.io import write_wav
    from signalsmith_stretch_tpu.io.corpus import batches, load_directory
    from signalsmith_stretch_tpu.models import StretchModel
    import signalsmith_stretch_tpu as sst
    sig, rate = test_signal

    paths = []
    for i in range(4):
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, sig[:, i * 500:i * 500 + 8000], rate)
        paths.append(p)
    items = (load_directory(paths[:2], time_factor=1.25)
             + load_directory(paths[2:], time_factor=1.0, semitones=3.0))

    models = {}
    rendered = {}
    for b in batches(items, batch_size=4, prefetch=1):
        rate_b, ch, in_len, tf, st = b["key"]
        out_len = int(round(in_len * tf))
        if b["key"] not in models:
            models[b["key"]] = StretchModel.build(
                channels=ch, sample_rate=rate_b, in_samples=in_len,
                out_samples=out_len, semitones=st,
                tonality_hz=2000 if st else 0, cheaper=True)
        out = np.asarray(models[b["key"]].batched(jnp.asarray(b["audio"])))
        for j, name in enumerate(b["names"]):
            rendered[name] = out[j]
    assert len(rendered) == 4

    # cross-check one clip from each bucket against a direct exact() render
    for idx, (tf, st) in [(0, (1.25, 0.0)), (2, (1.0, 3.0))]:
        clip = sig[:, idx * 500:idx * 500 + 8000]
        s = sst.SignalsmithStretch(seed=0)
        s.preset_cheaper(1, rate)
        s.set_transpose_semitones(st, (2000 / rate) if st else 0)
        direct, ok = s.exact(clip, int(round(8000 * tf)))
        assert ok
        got = rendered[paths[idx]][:, :direct.shape[1]]
        # batch path pads input to the bucket granule; same schedule when the
        # padded length matches, so outputs agree to float noise... but the
        # padded render has a different (longer) schedule: compare structurally
        e1 = np.sqrt(np.mean(got[:, 1000:9000] ** 2))
        e2 = np.sqrt(np.mean(direct[:, 1000:9000] ** 2))
        assert 0.7 < e1 / e2 < 1.4, (e1, e2)
