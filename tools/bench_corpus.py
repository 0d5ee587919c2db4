#!/usr/bin/env python
"""BASELINE config #5: corpus-scale sustained throughput on the chip.

Renders a 1000-clip mixed corpus (10 s clips; stereo 48 kHz unmapped,
stereo 48 kHz +12 st @ 8 kHz tonality, mono 44.1 kHz cheaper — the same
model keys as bench.py's configs, so the jit cache is shared) through the
full production pipeline: WAV decode (native sstio ext), bucketing,
prefetch thread with H2D overlap (io/corpus.py), batched render, on-device
checksum sync per batch.  Reports sustained clips/s and xrealtime for the
whole pipeline INCLUDING host I/O, plus the prefetch-off comparison and the
(relay-limited, ~30 MB/s on this attachment) output-fetch cost measured on
one batch.  Reference analogue: the corpus sweep driver
/root/reference/cmd/Makefile:12-33.

    python tools/bench_corpus.py [--clips N] [--out corpus_report.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu.io import write_wav
from signalsmith_stretch_tpu.io.corpus import batches, load_directory
from signalsmith_stretch_tpu.models import StretchModel


def gen_corpus(root, n_clips):
    """Three buckets matching bench.py's config shapes (cache reuse)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    specs = []
    per = n_clips // 3
    specs += [("st48", 48000, 2, 0.0)] * (n_clips - 2 * per)
    specs += [("p12", 48000, 2, 12.0)] * per
    specs += [("m44", 44100, 1, 0.0)] * per
    paths, meta = [], []
    for i, (tag, rate, ch, st) in enumerate(specs):
        path = os.path.join(root, f"{tag}_{i:04d}.wav")
        if not os.path.exists(path):
            t = np.arange(10 * rate) / rate
            f0 = 80 + 40 * (i % 13)
            clip = np.stack([
                0.3 * np.sin(2 * np.pi * f0 * (c + 1) * t)
                * (1 + 0.3 * np.sin(2 * np.pi * 0.7 * t))
                + 0.02 * rng.standard_normal(t.size)
                for c in range(ch)]).astype(np.float32)
            write_wav(path, clip, rate)
        paths.append(path)
        meta.append((rate, ch, st))
    return paths, meta


def run_pipeline(paths, meta, prefetch, batch_size=32):
    """Full pipeline wall time: decode -> bucket -> prefetch -> render."""
    t0 = time.perf_counter()
    by_key = {}
    items = load_directory(paths, time_factor=1.25)
    for it, (rate, ch, st) in zip(items, meta):
        it.semitones = st
    t_load = time.perf_counter() - t0

    fns, sums = {}, []
    audio_seconds = 0.0
    n = 0
    for b in batches(items, batch_size=batch_size, prefetch=prefetch):
        rate, ch, in_len, tf, st = b["key"]
        if b["key"] not in fns:
            m = StretchModel.build(
                channels=ch, sample_rate=rate, in_samples=in_len,
                out_samples=int(round(in_len * tf)), semitones=st,
                tonality_hz=8000 if st else 0,
                cheaper=(rate == 44100))
            # ONE jit per model key (a fresh jax.jit(lambda) per batch
            # re-traces the whole render graph every call — measured
            # ~33 s/batch of host tracing)
            fns[b["key"]] = jax.jit(
                lambda a, s, mm=m: jnp.sum(jnp.abs(mm.batched(a, s))))
        x = b["audio"] if not isinstance(b["audio"], np.ndarray) \
            else jnp.asarray(b["audio"])
        seeds = jnp.arange(x.shape[0], dtype=jnp.int32)
        sums.append(fns[b["key"]](x, seeds))
        audio_seconds += b["audio"].shape[0] * in_len / rate
        n += b["audio"].shape[0]
    for s in sums:
        float(s)                      # one final sync drains the pipeline
    wall = time.perf_counter() - t0
    return dict(wall_s=round(wall, 3), load_s=round(t_load, 3),
                clips=n, audio_seconds=round(audio_seconds, 1),
                clips_per_s=round(n / wall, 2),
                x_realtime=round(audio_seconds / wall, 1))


def main():
    n_clips = int(os.environ.get("SST_CORPUS_CLIPS", "1000"))
    root = os.environ.get("SST_CORPUS_DIR", "/tmp/sst_corpus")
    out_path = os.environ.get("SST_CORPUS_OUT", "corpus_report.json")

    t0 = time.perf_counter()
    paths, meta = gen_corpus(root, n_clips)
    print(f"corpus ready ({time.perf_counter()-t0:.1f}s, {len(paths)} clips)",
          flush=True)

    # warm the jit caches (compile excluded from the sustained number, like
    # bench.py: a production corpus run amortizes compiles across corpora)
    warm = run_pipeline(paths[:96], meta[:96], prefetch=2)
    print("warm:", json.dumps(warm), flush=True)

    res_pre = run_pipeline(paths, meta, prefetch=2)
    print("prefetch=2:", json.dumps(res_pre), flush=True)
    res_nopre = run_pipeline(paths, meta, prefetch=0)
    print("prefetch=0:", json.dumps(res_nopre), flush=True)

    # output-fetch cost, one batch (relay-limited on this attachment)
    items = load_directory(paths[:32], time_factor=1.25)
    for it, (rate, ch, st) in zip(items, meta[:32]):
        it.semitones = st
    b = next(iter(batches(items, batch_size=32, prefetch=0)))
    rate, ch, in_len, tf, st = b["key"]
    m = StretchModel.build(channels=ch, sample_rate=rate, in_samples=in_len,
                           out_samples=int(round(in_len * tf)), semitones=st,
                           tonality_hz=8000 if st else 0,
                           cheaper=(rate == 44100))
    out = m.batched(jnp.asarray(b["audio"]))
    float(jnp.sum(jnp.abs(out)))
    t0 = time.perf_counter()
    host = np.asarray(out)
    fetch_s = time.perf_counter() - t0
    fetch = dict(batch=32, bytes=int(host.nbytes), seconds=round(fetch_s, 2),
                 mb_per_s=round(host.nbytes / 2**20 / fetch_s, 1))
    print("output fetch:", json.dumps(fetch), flush=True)

    report = dict(platform=jax.default_backend(),
                  corpus=dict(clips=len(paths), clip_seconds=10.0,
                              buckets=["stereo48k 1.25x",
                                       "stereo48k +12st tonality8k 1.25x",
                                       "mono44k cheaper 1.25x"]),
                  prefetch2=res_pre, prefetch0=res_nopre,
                  output_fetch_one_batch=fetch)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
