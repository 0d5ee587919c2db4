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
    """Split the output into n_chunks uniform windows (static shapes for
    vmap) and compute input windows at the *global* rate.

    exact() maps its whole input buffer onto its whole output buffer
    (output[0] <-> buffer[0]), so each chunk's in/out lengths must keep the
    global ratio — the chunk input window is round(out_len * rate) samples
    starting at round(out_edge * rate); drift vs the monolithic time map stays
    below one sample per chunk.
    """
    rate = float(np.float32(in_samples) / np.float32(out_samples))
    out_len = -(-out_samples // n_chunks)
    out_edges = [min(i * out_len, out_samples) for i in range(n_chunks + 1)]
    in_len = int(round(out_len * rate))
    starts = [int(round(out_edges[i] * rate)) for i in range(n_chunks)]
    return out_edges, starts, in_len, out_len


def stretch_long(audio: np.ndarray, out_samples: int, cfg: StretchConfig,
                 controls: spectral.Controls, flags: spectral.SpectralFlags,
                 n_chunks: int, seed: int = 0, mesh=None, axis: str = "data"):
    """Render a long clip as n_chunks independent re-anchored chunks.

    audio [ch, in_samples] -> [ch, out_samples].  The chunk axis is a plain
    vmap; pass `mesh` (jax.sharding.Mesh) to shard the chunk axis across
    devices — each device renders its time-chunks locally and the only
    cross-device traffic is the final gather of disjoint output windows.
    Each chunk re-anchors through exact()'s outputSeek, so chunk outputs are
    sample-aligned; they differ from a monolithic render only in phase
    microstructure near chunk starts (fresh phase state; docs/PARITY.md).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    ch, in_samples = audio.shape
    out_edges, starts, in_len, out_len = plan_chunks(
        cfg, in_samples, out_samples, n_chunks)

    # gather per-chunk input windows (zero-padded outside the clip)
    pad = in_len + 8
    padded = np.zeros((ch, in_samples + 2 * pad), np.float32)
    padded[:, pad:pad + in_samples] = audio
    windows = np.stack([padded[:, pad + s:pad + s + in_len]
                        for s in starts])          # [n_chunks, ch, in_len]

    plan = engine.build_exact_plan(cfg, in_len, out_len)

    def run(w, s):
        return jax.vmap(lambda wi, si: engine.render_exact(
            wi, plan, controls, flags, seed=si))(w, s)

    seeds = np.arange(n_chunks, dtype=np.int32) + seed
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis, None, None))
        sseed = NamedSharding(mesh, P(axis))
        w_dev = jax.device_put(windows, shard)
        s_dev = jax.device_put(seeds, sseed)
        fn = jax.jit(run, in_shardings=(shard, sseed), out_shardings=shard)
        outs = np.asarray(fn(w_dev, s_dev))
    else:
        outs = np.asarray(jax.jit(run)(jnp.asarray(windows),
                                       jnp.asarray(seeds)))

    result = np.zeros((ch, out_samples), np.float32)
    for i in range(n_chunks):
        a, b = out_edges[i], out_edges[i + 1]
        if b > a:
            result[:, a:b] = outs[i][:, :b - a]
    return result
