"""Engine configuration and geometry.

Mirrors the configuration surface of the reference engine
(/root/reference/signalsmith-stretch.h:63-104): presets map a sample rate to
block/interval sizes, `configure` fixes channels/block/interval/split, and all
derived geometry (FFT size, bands, latencies) follows the clean-room STFT spec
shared with oracle/signalsmith-linear/stft.h.
"""
from __future__ import annotations

import dataclasses
import math


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@dataclasses.dataclass(frozen=True)
class StretchConfig:
    """Static engine geometry (compile-time constants for the jitted pipeline).

    The reference equivalents, for parity:
      channels/block/interval  — signalsmith-stretch.h:71-94 (`configure`)
      split_computation        — signalsmith-stretch.h:46, 102-104 (pure latency
                                 contract on TPU; the step-rationing scheduler is
                                 a CPU-real-time idiom with no TPU analogue)
    """

    channels: int
    block_samples: int
    interval_samples: int
    split_computation: bool = False

    # ---- presets (signalsmith-stretch.h:63-68; double arithmetic truncated
    # to int exactly as the C++ implicit conversion does) -------------------
    @classmethod
    def preset_default(cls, channels: int, sample_rate: float,
                       split_computation: bool = False) -> "StretchConfig":
        return cls(channels, int(sample_rate * 0.12), int(sample_rate * 0.03),
                   split_computation)

    @classmethod
    def preset_cheaper(cls, channels: int, sample_rate: float,
                       split_computation: bool = True) -> "StretchConfig":
        return cls(channels, int(sample_rate * 0.1), int(sample_rate * 0.04),
                   split_computation)

    # ---- derived geometry (shared STFT spec) ------------------------------
    @property
    def fft_samples(self) -> int:
        return _next_pow2(self.block_samples)

    @property
    def bands(self) -> int:
        return self.fft_samples // 2

    @property
    def input_latency(self) -> int:
        # stft.analysisLatency() (signalsmith-stretch.h:42-44)
        return self.block_samples // 2

    @property
    def output_latency(self) -> int:
        # stft.synthesisLatency() + split*interval (signalsmith-stretch.h:45-47)
        return (self.block_samples - self.block_samples // 2
                + (self.interval_samples if self.split_computation else 0))

    @property
    def seek_length(self) -> int:
        # signalsmith-stretch.h:166-168
        return self.block_samples + self.interval_samples

    def output_seek_length(self, playback_rate: float) -> int:
        # signalsmith-stretch.h:205-207 (float truncation as in C++ int cast)
        return int(self.input_latency + float(playback_rate) * self.output_latency)

    # Overlap factor used for smoothing lengths (signalsmith-stretch.h:636),
    # computed in float32 like `Sample(stft.fftSamples())/stft.defaultInterval()`.
    @property
    def smoothing_bins(self) -> float:
        import numpy as np
        return float(np.float32(self.fft_samples) / np.float32(self.interval_samples))

    @property
    def long_vertical_step(self) -> int:
        # std::round of the float32 smoothing_bins (signalsmith-stretch.h:637)
        return int(math.floor(self.smoothing_bins + 0.5))


# Spectral constants (signalsmith-stretch.h:508-509)
NOISE_FLOOR = 1e-15
MAX_CLEAN_STRETCH = 2.0
