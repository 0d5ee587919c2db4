"""Sequence-parallel long-clip rendering: time chunks with input halos.

The reference's block-to-block phase recursion (Band.output feeding the next
block, signalsmith-stretch.h:715-716, 788) makes time exactly-sequential, but
the reference itself ships a re-anchoring mechanism for jumping into the
middle of a stream — `outputSeek` (:172-204), which rebuilds latency-aligned
output from a window of surrounding input.  Long-clip scaling reuses exactly
that: split the *output* into chunks, give each device its input range plus an
`outputSeekLength` left halo, render each chunk independently (the phase state
re-anchors from the halo), and concatenate — sample-aligned by construction.

This is the documented "fast mode" of SURVEY.md §5: per-chunk outputs differ
from a monolithic render only through the chaotic phase microstructure near
chunk starts (see docs/PARITY.md); band-energy structure is preserved.  An
exact mode (sequential carry handoff over ICI via ppermute) is possible but
pointless for audio-sized states — re-anchoring costs one halo per chunk and
zero communication.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import engine, spectral
from ..config import StretchConfig

f32 = np.float32


def plan_chunks(cfg: StretchConfig, in_samples: int, out_samples: int,
                n_chunks: int):
    """Split the output into n_chunks; compute each chunk's input range.

    Every chunk gets the same input window length (static shapes for vmap);
    the time map follows exact()'s float32 rate arithmetic.
    """
    rate = f32(f32(in_samples) / f32(out_samples))
    out_edges = [out_samples * i // n_chunks for i in range(n_chunks + 1)]
    out_len = max(b - a for a, b in zip(out_edges, out_edges[1:]))
    out_edges = [min(i * out_len, out_samples) for i in range(n_chunks + 1)]

    in_len = int(np.ceil(out_len * float(rate))) + cfg.seek_length + cfg.interval_samples
    starts = []
    for i in range(n_chunks):
        in_pos = int(np.floor(out_edges[i] * float(rate)))
        start = in_pos - cfg.seek_length
        starts.append(start)
    return out_edges, starts, in_len, out_len


def stretch_long(audio: np.ndarray, out_samples: int, cfg: StretchConfig,
                 controls: spectral.Controls, flags: spectral.SpectralFlags,
                 n_chunks: int, seed: int = 0):
    """Render a long clip as n_chunks independent re-anchored chunks.

    audio [ch, in_samples] -> [ch, out_samples].  The chunk axis is a plain
    vmap (shard it with parallel.batch.make_mesh + device_put for multi-chip).
    """
    ch, in_samples = audio.shape
    out_edges, starts, in_len, out_len = plan_chunks(
        cfg, in_samples, out_samples, n_chunks)

    # gather per-chunk input windows (zero-padded outside the clip)
    padded = np.zeros((ch, in_samples + 2 * in_len), np.float32)
    padded[:, in_len:in_len + in_samples] = audio
    windows = np.stack([padded[:, in_len + s:in_len + s + in_len]
                        for s in starts])          # [n_chunks, ch, in_len]

    # each chunk renders out_len samples aligned to its out_edge
    plan = engine.build_exact_plan(cfg, in_len, out_len)

    def run(w, s):
        return engine.render_exact(w, plan, controls, flags, seed=s)

    seeds = jnp.arange(n_chunks, dtype=jnp.int32) + seed
    outs = jax.jit(jax.vmap(run))(jnp.asarray(windows), seeds)
    outs = np.asarray(outs)

    result = np.zeros((ch, out_samples), np.float32)
    for i in range(n_chunks):
        a, b = out_edges[i], out_edges[i + 1]
        if b <= a:
            continue
        # chunk output is aligned so that sample `seek-related offset` == out edge
        off = _chunk_output_offset(cfg, in_samples, out_samples, i, starts[i])
        result[:, a:b] = outs[i][:, off:off + (b - a)]
    return result


def plan_rate(cfg, in_len, out_len):
    return float(np.float32(in_len) / np.float32(out_len))


def _chunk_output_offset(cfg, in_samples, out_samples, i, start):
    """Output samples of chunk i to skip so chunk output aligns to its edge.

    exact() output sample 0 corresponds to input position `seekLength` region
    start; chunk i's input window starts at `start = in_pos - seek_length`, so
    its output sample 0 maps to input `start + seek_length = in_pos`, i.e.
    exactly the chunk's first output sample.  No skip needed.
    """
    return 0
