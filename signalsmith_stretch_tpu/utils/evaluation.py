"""Corpus evaluation helpers shared by tests/test_corpus_stats.py and
tools/sweep_corpus.py (the cmd/Makefile:12-33 sweep analogue).

Gates follow docs/PARITY.md's taxonomy: structural band-energy /
envelope comparisons are stable under the phase recursion's chaos,
sample-level gates must be chaos-relative and cut clear of the
RNG-divergent flush tail.
"""
from __future__ import annotations

import numpy as np

# Pinned per-kind seeds: Python's salted hash() made clip content differ
# per process, so "the suite is green" was unfalsifiable run to run.
KIND_SEEDS = {"harmonic": 101, "sweep": 202, "noise": 303, "transients": 404}
KINDS = list(KIND_SEEDS)


def synth_clip(kind: str, rate: int, seconds: float,
               seed: int | None = None) -> np.ndarray:
    """Deterministic mono test clip [1, n] float32 of the given character."""
    rng = np.random.default_rng(KIND_SEEDS[kind] if seed is None else seed)
    t = np.arange(int(rate * seconds)) / rate
    if kind == "harmonic":
        sig = sum((0.5 / (i + 1)) * np.sin(2 * np.pi * 130 * (i + 1) * t + i)
                  for i in range(6))
    elif kind == "sweep":
        sig = 0.5 * np.sin(2 * np.pi * (100 * t + 400 * t * t))
    elif kind == "noise":
        sig = 0.3 * rng.standard_normal(t.shape)
    elif kind == "transients":
        sig = np.zeros_like(t)
        sig[::1600] = 1.0
        k = np.exp(-np.arange(200) / 30.0)
        sig = np.convolve(sig, k)[:t.size] * 0.5
    else:
        raise ValueError(kind)
    sig = sig + 0.01 * rng.standard_normal(t.shape)
    return sig[None, :].astype(np.float32)


def band_energies(x: np.ndarray, rate: int, n_fft: int = 1024) -> np.ndarray:
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


def envelope_db(out: np.ndarray, ref: np.ndarray, rate: int,
                window_s: float = 0.05) -> float:
    """Mean |broadband RMS envelope deviation| in dB over window_s windows."""
    w = int(window_s * rate)
    n = (min(out.shape[1], ref.shape[1]) // w) * w
    env_m = np.sqrt((out[0, :n].reshape(-1, w) ** 2).mean(1) + 1e-12)
    env_r = np.sqrt((ref[0, :n].reshape(-1, w) ** 2).mean(1) + 1e-12)
    return float(20 * np.abs(np.log10(env_m / env_r)).mean())
