"""TPU-native time-stretching and pitch-shifting framework.

A ground-up JAX/XLA re-design with the full capabilities of Signalsmith
Stretch v1.3.2 (phase-vocoder time-stretch, pitch-shift with tonality limit
and custom frequency maps, formant correction, streaming API with exact
latency semantics), built as a batched compiled tensor pipeline instead of a
per-sample streaming loop.  See SURVEY.md for the reference analysis.
"""
from .api import SignalsmithStretch
from .config import StretchConfig
from .spectral import Controls, SpectralFlags

__version__ = "0.1.0"
version = (0, 1, 0)

__all__ = ["SignalsmithStretch", "StretchConfig", "Controls", "SpectralFlags"]
