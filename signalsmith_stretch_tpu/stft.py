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
    the spectrum is the conjugate mirror and never materialized).

    The modified transform's pre-twist e^{-i pi n / N} is separable
    (t1[n1] * t2[n2]); it is folded into the stage-1 matrix (t1) and the
    twiddle (t2), so the forward stage 1 consumes the REAL windowed signal
    directly (2 real einsums instead of 4, no complex pre-twist buffers).
    The inverse folds the conjugates the same way and produces only the real
    part of u * conj(twist)."""
    N = fft_samples
    log2 = N.bit_length() - 1
    N1 = 1 << (log2 // 2)
    N2 = N // N1
    k1 = np.arange(N1)
    n1 = np.arange(N1)
    n2 = np.arange(N2)
    k2 = np.arange(N2 // 2)
    t1 = np.exp(-1j * np.pi * n1 * N2 / N)                      # [N1]
    t2 = np.exp(-1j * np.pi * n2 / N)                           # [N2]
    dft1 = np.exp(-2j * np.pi * np.outer(k1, n1) / N1) * t1     # [K1, N1]
    tw = np.exp(-2j * np.pi * np.outer(k1, n2) / N) * t2        # [K1, N2]
    dft2 = np.exp(-2j * np.pi * np.outer(n2, k2) / N2)          # [N2, K2]
    # inverse (synthesis): y = 2 Re[(1/N) sum_b S_b W^{-nb} * conj(t1 t2)]
    idft2 = np.exp(+2j * np.pi * np.outer(k2, n2) / N2)         # [K2, N2]
    itw = (np.exp(+2j * np.pi * np.outer(n2, k1) / N).T
           * np.conj(t2))                                       # [K1, N2]
    idft1 = (np.exp(+2j * np.pi * np.outer(k1, n1) / N1) / N
             * np.conj(t1))                                     # [K1, N1]
    c64 = lambda m: m.astype(np.complex64)
    return N1, N2, c64(dft1), c64(tw), c64(dft2), c64(idft2), c64(itw), c64(idft1)


@functools.lru_cache(maxsize=None)
def _dft_fused_mats(fft_samples: int):
    """Twiddle-folded stage-2 tensors (computed in float64, cast to f32).

    Forward: xr/xi = einsum("bkm,kmq->bqk", ar|ai, T1|T2) combinations with
      T1 = twr*d2r - twi*d2i,  T2 = twr*d2i + twi*d2r        [K1, N2, K2]
    Inverse: y = einsum("bkm,knm->bnm", cr, V1) - einsum(..., ci, V2) with
      V1 = i1r*itr - i1i*iti,  V2 = i1r*iti + i1i*itr        [K1, N1, N2]
    This removes the materialized br/bi (forward) and dr/di (inverse)
    intermediates -- one full HBM round-trip of the [.., K1, N2] planes each
    way; measured ~8 ms off the forward DFT at bench shapes
    (tools/exp_dft_stages.py: fused-tw 61.9 vs +reshape 69.6 ms)."""
    N = fft_samples
    _, N2, dft1, tw, dft2, idft2, itw, idft1 = _dft_mats(N)
    f32m = lambda m: np.ascontiguousarray(m.astype(np.float32))
    T1 = f32m(tw.real[:, :, None] * dft2.real[None]
              - tw.imag[:, :, None] * dft2.imag[None])       # [K1, N2, K2]
    T2 = f32m(tw.real[:, :, None] * dft2.imag[None]
              + tw.imag[:, :, None] * dft2.real[None])
    # inverse: fold conj-twiddle itw into the k1-contraction idft1
    V1 = f32m(idft1.real[:, :, None] * itw.real[:, None, :]
              - idft1.imag[:, :, None] * itw.imag[:, None, :])
    V2 = f32m(idft1.real[:, :, None] * itw.imag[:, None, :]
              + idft1.imag[:, :, None] * itw.real[:, None, :])
    return T1, T2, V1, V2


@functools.lru_cache(maxsize=None)
def _dft_onepass_mats(fft_samples: int):
    """Interleaved-constant matrices for the ONE-einsum-per-stage DFT.

    The split formulation (xr = ar@T1 - ai@T2; xi = ar@T2 + ai@T1) issues
    four dot_generals per stage: each reads its [b, K1, N2] operand from HBM
    separately and materializes a partial product before the add/sub — the
    forward DFT measured ~61 ms at bench shapes against a ~22 ms memory
    floor.  Interleaving re/im into the constants makes each stage ONE real
    einsum with identical FLOPs (the 2x wider contraction has half the
    einsums), so every operand is read once and no partials exist.

      stage 1: D1I[s*N1+k, n1]     = (Re, Im)[s] dft1[k, n1]
               A[b, s*N1+k, n2]    = einsum(D1I, y)        # y real
      stage 2: W2[s, k, m, t*K2+q] = [[T1, T2], [-T2, T1]][s][t]
               X[b, t*K2+q, k]     = einsum(A', W2)  # A' free 4-dim view
      xr, xi = X[:, :K2], X[:, K2:]  (bands index = k1 + N1*k2, as before)

    Inverse mirrors it: WI1[u, q, s*N2+m] = [[i2r, i2i], [-i2i, i2r]][u][s]
    contracts the stacked (re, im) spectra to C[b, k, s*N2+m]; stage 2
    contracts (s, k) against VI[s, k, n1, n2] = (V1, -V2)[s] with n2 as the
    element-wise batch dim.  Values differ from the split formulation only
    by reassociation (the sub/add becomes part of the MXU accumulation)."""
    N = fft_samples
    N1, N2, dft1, _, _, idft2, _, _ = _dft_mats(N)
    T1, T2, V1, V2 = _dft_fused_mats(N)
    K2 = N2 // 2
    f = np.float32
    D1I = np.empty((2 * N1, N1), f)                        # [s*N1+k, n1]
    D1I[:N1] = dft1.real.astype(f)                         # s-major: the
    D1I[N1:] = dft1.imag.astype(f)    # [b, 2, K1, N2] view of A is free
    # under TPU (8, 128) tiling, unlike the k-major [b, K1, 2*N2] merge
    # which relayouts 3.5 GB (measured: 25.0 vs 15.5 ms forward DFT,
    # tools/exp_dft_onepass.py)
    W2 = np.empty((2, N1, N2, 2 * K2), f)                  # [s, k, m, t|q]
    W2[0, :, :, :K2] = T1
    W2[0, :, :, K2:] = T2
    W2[1, :, :, :K2] = -T2
    W2[1, :, :, K2:] = T1
    i2r = idft2.real.astype(f)                             # [K2, N2]
    i2i = idft2.imag.astype(f)
    WI1 = np.empty((2, K2, 2 * N2), f)                     # [u, q, s|m]
    WI1[0, :, :N2] = i2r
    WI1[0, :, N2:] = i2i
    WI1[1, :, :N2] = -i2i
    WI1[1, :, N2:] = i2r
    VI = np.stack([V1, -V2])                               # [s, K1, N1, N2]
    return D1I, W2, WI1, VI


def _dft_layout() -> str:
    """'onepass' (one einsum per DFT stage, interleaved constants) or
    'split' (separate re/im dots).  Override with SST_DFT_LAYOUT."""
    mode = os.environ.get("SST_DFT_LAYOUT", "onepass")
    if mode not in ("onepass", "split"):
        raise ValueError("SST_DFT_LAYOUT must be onepass or split")
    return mode


def _dft_precision() -> str:
    """MXU pass count for the DFT einsums (SST_DFT_PRECISION).

    'highest' = 6-pass bf16 (closest to true f32), 'high' = 3-pass.
    Measured (tools/exp_dft_precision.py, v5e): highest -141 dB forward
    accuracy vs a float64 DFT, high -94 dB, default (1-pass bf16) -50 dB --
    and ALL THREE run at the same wall time (the DFT einsums are
    bandwidth-bound at these shapes, not MXU-pass-bound), so there is no
    speed to buy: keep 'highest' and its -124 dB identity gate."""
    return os.environ.get("SST_DFT_PRECISION", "highest")


def _cedot(sub: str, ar, ai, br, bi):
    """Complex einsum (ar+i*ai) x (br+i*bi) at f32 MXU precision."""
    dot = functools.partial(jnp.einsum, sub, precision=_dft_precision())
    return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))


def _matmul_dft(y: jnp.ndarray, basis: StftBasis):
    """Forward modified DFT of the REAL windowed signal y [..., M]
    -> [..., N/2] (re, im); the modified pre-twist is folded into the
    constants (see _dft_mats).

    y may be SHORTER than N as long as its length is a multiple of N2: the
    fft zero-pad is then folded into the stage-1 contraction by truncating
    the dft1 columns (the dropped terms multiply exact zeros).  Numerically
    identical to padding up to signed zeros (-0.0+0.0 = +0.0) and the
    shortened reduction order; tests gate at 3e-6 relative.
    This skips materializing the ~42% zero tail of every frame at bench
    shapes (block 5760 vs fft 8192).

    Stage orientation keeps every materialized intermediate's minor dim at
    N2 = 128 (unaligned minors relayout at ~1/10 bandwidth on TPU); the only
    sub-128 buffer is the final [k2, k1] tile pair, merged immediately into
    the aligned [bands] layout (b = k1 + N1*k2).
    """
    N1, N2, dft1, _, _, _, _, _ = _dft_mats(basis.fft_samples)
    shape = y.shape[:-1]
    M = y.shape[-1]
    assert M % N2 == 0 and M <= basis.fft_samples
    n1u = M // N2
    K2 = N2 // 2
    y = y.reshape(-1, n1u, N2)                   # n = n1*N2 + n2, minor 128
    if _dft_layout() == "onepass":
        # one einsum per stage, re/im interleaved into the constants (see
        # _dft_onepass_mats); identical FLOPs, every operand read once
        D1I, W2, _, _ = _dft_onepass_mats(basis.fft_samples)
        A = jnp.einsum("Kn,bnm->bKm", jnp.asarray(D1I[:, :n1u]), y,
                       precision=_dft_precision())     # [b, s*N1+k, N2]
        A2 = A.reshape(-1, 2, N1, N2)                  # free view (s major)
        X = jnp.einsum("bskm,skmQ->bQk", A2, jnp.asarray(W2),
                       precision=_dft_precision())     # [b, t|q, k]
        xr = X[:, :K2].reshape(shape + (basis.bands,))
        xi = X[:, K2:].reshape(shape + (basis.bands,))
        return xr, xi
    T1, T2, _, _ = _dft_fused_mats(basis.fft_samples)
    # stage 1 (real input): contract n1 -> A[b, k1, n2]
    dot = functools.partial(jnp.einsum, "kn,bnm->bkm",
                            precision=_dft_precision())
    ar = dot(jnp.asarray(dft1.real[:, :n1u]), y)
    ai = dot(jnp.asarray(dft1.imag[:, :n1u]), y)
    # stage 2 with the twiddle folded into per-k1 matrices (see
    # _dft_fused_mats): contract n2 -> X[b, k2, k1], no br/bi intermediates
    dot2 = functools.partial(jnp.einsum, "bkm,kmq->bqk",
                             precision=_dft_precision())
    t1, t2 = jnp.asarray(T1), jnp.asarray(T2)
    xr = dot2(ar, t1) - dot2(ai, t2)
    xi = dot2(ar, t2) + dot2(ai, t1)
    xr = xr.reshape(shape + (basis.bands,))      # b = k1 + N1*k2
    xi = xi.reshape(shape + (basis.bands,))
    return xr, xi


def _matmul_idft(sr: jnp.ndarray, si: jnp.ndarray, basis: StftBasis,
                 out_len: int = 0):
    """Inverse of _matmul_dft: [..., N/2] -> REAL 2*Re[u*conj(twist)]
    [..., M] (the conjugate twist is folded into the constants).

    With out_len set, only samples n < M = ceil(out_len/N2)*N2 are emitted
    (the synthesis window discards the rest anyway): the idft1 columns
    beyond M/N2 are dropped, skipping ~30% of stage-2 output bytes at
    bench shapes.  Emitted values are bit-identical."""
    N1, N2, _, _, _, idft2, _, _ = _dft_mats(basis.fft_samples)
    shape = sr.shape[:-1]
    K2 = N2 // 2
    n1u = N1 if not out_len else min(N1, -(-out_len // N2))
    sr = sr.reshape(-1, K2, N1)   # free view [b, k2, k1] of the aligned input
    si = si.reshape(-1, K2, N1)
    if _dft_layout() == "onepass":
        _, _, WI1, VI = _dft_onepass_mats(basis.fft_samples)
        S2 = jnp.stack([sr, si], axis=1)               # [b, u, k2, k1]
        C = jnp.einsum("buqk,uqM->bkM", S2, jnp.asarray(WI1),
                       precision=_dft_precision())     # [b, k1, s|m]
        C2 = C.reshape(-1, N1, 2, N2)                  # free view
        y = jnp.einsum("bksm,sknm->bnm", C2, jnp.asarray(VI[:, :, :n1u]),
                       precision=_dft_precision())     # batch dim m
        return 2.0 * y.reshape(shape + (n1u * N2,))
    _, _, V1, V2 = _dft_fused_mats(basis.fft_samples)
    # stage 1: contract k2 -> C[b, k1, n2] (minor 128)
    i2r, i2i = jnp.asarray(idft2.real), jnp.asarray(idft2.imag)  # [K2, N2]
    cr, ci = _cedot("qm,bqk->bkm", i2r, i2i, sr, si)
    # stage 2 with the conj-twiddle folded into the k1-contraction (see
    # _dft_fused_mats): no dr/di intermediates; merge n = n1*N2 + n2
    dot = functools.partial(jnp.einsum, "bkm,knm->bnm",
                            precision=_dft_precision())
    v1 = jnp.asarray(V1[:, :n1u])
    v2 = jnp.asarray(V2[:, :n1u])
    y = dot(cr, v1) - dot(ci, v2)
    return 2.0 * y.reshape(shape + (n1u * N2,))


def analyze(frames: jnp.ndarray, basis: StftBasis) -> jnp.ndarray:
    """Windowed modified-FFT analysis.  frames [..., block] -> [..., bands]."""
    xr, xi = analyze_pair(frames, basis)
    return jax.lax.complex(xr, xi)


def analyze_pair(frames: jnp.ndarray, basis: StftBasis):
    """`analyze` returning (re, im) f32 planes — the matmul DFT computes
    planes natively, so skipping the complex64 interleave lets the TPU
    pipeline stay planar end to end (the interleave + later deinterleave
    measured ~25 ms of the analysis stage at bench shapes)."""
    window = jnp.asarray(basis.window)
    y = frames.astype(jnp.float32) * window
    if _fft_mode() == "matmul":
        # pad only to the next N2 multiple; the rest of the fft zero-pad
        # is folded into the stage-1 contraction (bit-identical)
        N2 = _dft_mats(basis.fft_samples)[1]
        pad = -(-basis.block_samples // N2) * N2 - basis.block_samples
        if pad:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
        return _matmul_dft(y, basis)
    pad = basis.fft_samples - basis.block_samples
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    twist = jnp.asarray(basis.twist)
    z = y.astype(jnp.complex64) * twist
    spec = jnp.fft.fft(z, axis=-1)
    spec = spec[..., :basis.bands].astype(jnp.complex64)
    return spec.real, spec.imag


def synthesize_pair(sr: jnp.ndarray, si: jnp.ndarray,
                    basis: StftBasis) -> jnp.ndarray:
    """`synthesize` on separate re/im float32 planes.

    The TPU sweep computes its outputs as f32 plane pairs; consuming them
    directly avoids the interleaved-complex64 materialization at the
    sweep->synthesis fusion boundary AND the strided .real/.imag extraction
    inside the matmul iDFT (~2.3x on the synthesis FFT at bench shapes)."""
    if _fft_mode() == "matmul":
        y = _matmul_idft(sr, si, basis, out_len=basis.block_samples)
        y = y[..., :basis.block_samples]
        return (y * jnp.asarray(basis.window)).astype(jnp.float32)
    return synthesize(jax.lax.complex(sr, si), basis)


def synthesize(spectra: jnp.ndarray, basis: StftBasis) -> jnp.ndarray:
    """Inverse modified FFT + synthesis window.  [..., bands] -> [..., block].

    Matches the oracle: y[n] = 2*Re(ifft(pad(S))[n] * conj(twist[n])) * w[n].
    """
    if _fft_mode() == "matmul":
        y = _matmul_idft(spectra.real, spectra.imag, basis,
                         out_len=basis.block_samples)
        y = y[..., :basis.block_samples]
        return (y * jnp.asarray(basis.window)).astype(jnp.float32)
    twist = jnp.asarray(basis.twist)
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
