"""Modified-real-FFT STFT substrate (JAX), the TPU-native L0 layer.

Implements the shared clean-room STFT spec (see oracle/signalsmith-linear/
stft.h and SURVEY.md §2.2): half-bin-offset "modified" real FFT over a
power-of-two frame, Kaiser windows, and WOLA weight normalization.  Frames are
processed as batched tensors ([..., block] -> [..., bands]); all streaming/ring
behaviour lives in the schedule/engine layers as static arithmetic.

  analysis:   S_b = sum_n  w[n] x[n] e^{-2πi n (b+0.5)/N},  b < N/2
  synthesis:  y[n] = 2/N * Re[ sum_b S_b e^{+2πi n (b+0.5)/N} ] * w[n]

bin b has normalized frequency (b + 0.5)/N cycles/sample.
"""
from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from .config import StretchConfig
from .windows import kaiser_window


@dataclasses.dataclass(frozen=True)
class StftBasis:
    """Precomputed constants for one config (host numpy, baked into the jit)."""

    window: np.ndarray        # [block] float32
    twist: np.ndarray         # [fft] complex64, e^{-i pi n / N}
    fft_samples: int
    block_samples: int
    bands: int

    @classmethod
    @functools.lru_cache(maxsize=None)
    def _cached(cls, block_samples: int, interval_samples: int) -> "StftBasis":
        fft = 1
        while fft < block_samples:
            fft <<= 1
        window = kaiser_window(block_samples, interval_samples)
        n = np.arange(fft, dtype=np.float64)
        angle = -np.pi * n / fft
        twist = (np.cos(angle).astype(np.float32)
                 + 1j * np.sin(angle).astype(np.float32)).astype(np.complex64)
        return cls(window=window, twist=twist, fft_samples=fft,
                   block_samples=block_samples, bands=fft // 2)

    @classmethod
    def for_config(cls, cfg: StretchConfig) -> "StftBasis":
        return cls._cached(cfg.block_samples, cfg.interval_samples)


def analyze(frames: jnp.ndarray, basis: StftBasis) -> jnp.ndarray:
    """Windowed modified-FFT analysis.  frames [..., block] -> [..., bands]."""
    window = jnp.asarray(basis.window)
    y = frames.astype(jnp.float32) * window
    pad = basis.fft_samples - basis.block_samples
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    z = y.astype(jnp.complex64) * jnp.asarray(basis.twist)
    spec = jnp.fft.fft(z, axis=-1)
    return spec[..., :basis.bands].astype(jnp.complex64)


def synthesize(spectra: jnp.ndarray, basis: StftBasis) -> jnp.ndarray:
    """Inverse modified FFT + synthesis window.  [..., bands] -> [..., block].

    Matches the oracle: y[n] = 2*Re(ifft(pad(S))[n] * conj(twist[n])) * w[n].
    """
    pad = basis.fft_samples - basis.bands
    full = jnp.pad(spectra.astype(jnp.complex64),
                   [(0, 0)] * (spectra.ndim - 1) + [(0, pad)])
    u = jnp.fft.ifft(full, axis=-1)
    twist = jnp.asarray(basis.twist)
    y = 2.0 * (u.real * twist.real + u.imag * twist.imag)
    y = y[..., :basis.block_samples]
    return (y * jnp.asarray(basis.window)).astype(jnp.float32)


def band_freqs(basis: StftBasis) -> np.ndarray:
    """Normalized centre frequency of each band, float32 [bands]."""
    b = np.arange(basis.bands, dtype=np.float32)
    return ((b + np.float32(0.5)) / np.float32(basis.fft_samples)).astype(np.float32)


def wola_weight(basis: StftBasis, ring_len: int, block_positions: np.ndarray,
                weight_floor: float = 0.1) -> np.ndarray:
    """Accumulated WOLA weight ring for a static block placement schedule.

    Float32 accumulation in block order, matching the oracle's
    `weight[idx] += window[n]*window[n]` loop; clamped below by the reset()
    floor before use as a divisor (signalsmith-stretch.h reset(0.1) call sites).
    """
    w2 = (basis.window * basis.window).astype(np.float32)
    weight = np.zeros(ring_len, np.float32)
    for pos in block_positions:
        weight[pos:pos + basis.block_samples] += w2[:max(0, min(basis.block_samples, ring_len - pos))]
    return np.maximum(weight, np.float32(weight_floor))
