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
import os

import jax
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


def _fft_mode() -> str:
    """'matmul' (MXU Cooley-Tukey DFT) on TPU, 'fft' (jnp.fft) elsewhere.

    XLA's TPU FFT measures ~4 GFLOP/s on these shapes; the two-stage matmul
    DFT spends ~25x the FLOPs but runs on the MXU (three-pass bf16 f32
    precision), ~50-100x faster end to end.  Override with SST_FFT_MODE.
    """
    mode = os.environ.get("SST_FFT_MODE", "auto")
    if mode in ("fft", "matmul"):
        return mode
    import jax
    return "matmul" if jax.default_backend() == "tpu" else "fft"


@functools.lru_cache(maxsize=None)
def _dft_mats(fft_samples: int):
    """Constants for the two-stage Cooley-Tukey matmul DFT of the modified
    transform.  n = n1*N2 + n2, b = k1 + N1*k2 with k2 < N2/2 (upper half of
    the spectrum is the conjugate mirror and never materialized)."""
    N = fft_samples
    log2 = N.bit_length() - 1
    N1 = 1 << (log2 // 2)
    N2 = N // N1
    w = np.exp(-2j * np.pi / N)
    k1 = np.arange(N1)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    k2 = np.arange(N2 // 2)
    dft1 = np.exp(-2j * np.pi * np.outer(k1, n1) / N1)          # [K1, N1]
    tw = np.exp(-2j * np.pi * np.outer(k1, n2) / N)             # [K1, N2]
    dft2 = np.exp(-2j * np.pi * np.outer(n2, k2) / N2)          # [N2, K2]
    # inverse (synthesis): u = (1/N) sum_b S_b W^{-nb}
    idft2 = np.exp(+2j * np.pi * np.outer(k2, n2) / N2)         # [K2, N2]
    itw = np.exp(+2j * np.pi * np.outer(n2, k1) / N)            # [N2, K1]
    idft1 = np.exp(+2j * np.pi * np.outer(k1, n1) / N1) / N     # [K1, N1]
    c64 = lambda m: m.astype(np.complex64)
    return N1, N2, c64(dft1), c64(tw), c64(dft2), c64(idft2), c64(itw), c64(idft1)


def _cmatmul(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi) with f32-precision MXU dots."""
    dot = functools.partial(jnp.matmul, precision="highest")
    return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))


def _matmul_dft(zr: jnp.ndarray, zi: jnp.ndarray, basis: StftBasis):
    """Forward modified DFT of complex z [..., N] -> [..., N/2] (re, im)."""
    N1, N2, dft1, tw, dft2, _, _, _ = _dft_mats(basis.fft_samples)
    shape = zr.shape[:-1]
    zr = zr.reshape(-1, N1, N2)
    zi = zi.reshape(-1, N1, N2)
    # stage 1: contract n1 -> A[k1, n2]
    d1r, d1i = jnp.asarray(dft1.real), jnp.asarray(dft1.imag)
    ar, ai = _cmatmul(jnp.moveaxis(zr, -2, -1), jnp.moveaxis(zi, -2, -1),
                      d1r.T, d1i.T)              # [batch, n2, k1]
    # twiddle W_N^{k1 n2}
    twr, twi = jnp.asarray(tw.real.T), jnp.asarray(tw.imag.T)  # [n2, k1]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage 2: contract n2 -> X[k1, k2];  operand layout [batch, k1, n2]
    br = jnp.moveaxis(br, -2, -1)
    bi = jnp.moveaxis(bi, -2, -1)
    d2r, d2i = jnp.asarray(dft2.real), jnp.asarray(dft2.imag)
    xr, xi = _cmatmul(br, bi, d2r, d2i)          # [batch, k1, k2]
    # bins b = k1 + N1*k2 -> layout [k2, k1]
    xr = jnp.moveaxis(xr, -2, -1).reshape(shape + (basis.bands,))
    xi = jnp.moveaxis(xi, -2, -1).reshape(shape + (basis.bands,))
    return xr, xi


def _matmul_idft(sr: jnp.ndarray, si: jnp.ndarray, basis: StftBasis):
    """Inverse of _matmul_dft: [..., N/2] -> complex u [..., N] (re, im)."""
    N1, N2, _, _, _, idft2, itw, idft1 = _dft_mats(basis.fft_samples)
    shape = sr.shape[:-1]
    K2 = N2 // 2
    sr = sr.reshape(-1, K2, N1)   # [batch, k2, k1]
    si = si.reshape(-1, K2, N1)
    # stage 1: contract k2 -> C[k1, n2]; operands as [batch, k1, k2]
    sr = jnp.moveaxis(sr, -2, -1)
    si = jnp.moveaxis(si, -2, -1)
    i2r, i2i = jnp.asarray(idft2.real), jnp.asarray(idft2.imag)  # [K2, N2]
    cr, ci = _cmatmul(sr, si, i2r, i2i)          # [batch, k1, n2]
    # twiddle W_N^{-n2 k1}
    itr, iti = jnp.asarray(itw.real.T), jnp.asarray(itw.imag.T)  # [k1, n2]
    dr = cr * itr - ci * iti
    di = cr * iti + ci * itr
    # stage 2: contract k1 -> u[n1, n2]; operands [batch, n2, k1]
    dr = jnp.moveaxis(dr, -2, -1)
    di = jnp.moveaxis(di, -2, -1)
    i1r, i1i = jnp.asarray(idft1.real), jnp.asarray(idft1.imag)  # [k1, n1]
    ur, ui = _cmatmul(dr, di, i1r, i1i)          # [batch, n2, n1]
    ur = jnp.moveaxis(ur, -2, -1).reshape(shape + (basis.fft_samples,))
    ui = jnp.moveaxis(ui, -2, -1).reshape(shape + (basis.fft_samples,))
    return ur, ui


def analyze(frames: jnp.ndarray, basis: StftBasis) -> jnp.ndarray:
    """Windowed modified-FFT analysis.  frames [..., block] -> [..., bands]."""
    window = jnp.asarray(basis.window)
    y = frames.astype(jnp.float32) * window
    pad = basis.fft_samples - basis.block_samples
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    twist = jnp.asarray(basis.twist)
    if _fft_mode() == "matmul":
        zr = y * twist.real
        zi = y * twist.imag
        xr, xi = _matmul_dft(zr, zi, basis)
        return jax.lax.complex(xr, xi)
    z = y.astype(jnp.complex64) * twist
    spec = jnp.fft.fft(z, axis=-1)
    return spec[..., :basis.bands].astype(jnp.complex64)


def synthesize(spectra: jnp.ndarray, basis: StftBasis) -> jnp.ndarray:
    """Inverse modified FFT + synthesis window.  [..., bands] -> [..., block].

    Matches the oracle: y[n] = 2*Re(ifft(pad(S))[n] * conj(twist[n])) * w[n].
    """
    twist = jnp.asarray(basis.twist)
    if _fft_mode() == "matmul":
        ur, ui = _matmul_idft(spectra.real, spectra.imag, basis)
        y = 2.0 * (ur * twist.real + ui * twist.imag)
        y = y[..., :basis.block_samples]
        return (y * jnp.asarray(basis.window)).astype(jnp.float32)
    pad = basis.fft_samples - basis.bands
    full = jnp.pad(spectra.astype(jnp.complex64),
                   [(0, 0)] * (spectra.ndim - 1) + [(0, pad)])
    u = jnp.fft.ifft(full, axis=-1)
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
