"""Audio file I/O: 16-bit PCM WAV (stdlib) and the oracle's raw-float format.

Equivalent of the reference's util/wav.h dev dependency (absent submodule,
see SURVEY.md §2.1 "missing-from-mount").  WAV is 16-bit PCM like the
reference CLI; raw is the lossless planar float32 format shared with
oracle/wav.h for parity tests.
"""
from __future__ import annotations

import struct
import wave

import numpy as np

try:  # native codec (native/sstio.cpp, built by `make -C native`)
    from .. import _sstio
except ImportError:  # pragma: no cover - fallback when not built
    _sstio = None


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Returns ([channels, samples] float32 in [-1, 1), sample_rate)."""
    if _sstio is not None:
        with open(path, "rb") as f:
            data = f.read()
        try:
            ch, rate, planar = _sstio.decode_wav16(data)
            return (np.frombuffer(planar, np.float32).reshape(ch, -1).copy(),
                    rate)
        except ValueError:
            pass  # non-canonical WAV; fall through to the stdlib parser
    with wave.open(path, "rb") as w:
        ch = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        frames = w.getnframes()
        data = w.readframes(frames)
    if width != 2:
        raise ValueError(f"only 16-bit PCM WAV supported, got {8*width}-bit")
    pcm = np.frombuffer(data, "<i2").reshape(frames, ch)
    return (pcm.T.astype(np.float32) / 32768.0), rate


def write_wav(path: str, audio: np.ndarray, sample_rate: int):
    """audio [channels, samples] float32; clipped and quantized like oracle/wav.h."""
    if _sstio is not None:
        audio = np.ascontiguousarray(audio, np.float32)
        data = _sstio.encode_wav16(audio.tobytes(), audio.shape[0],
                                   int(sample_rate))
        with open(path, "wb") as f:
            f.write(data)
        return
    audio = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    pcm = np.where(audio >= 0, audio * 32767.0 + 0.5,
                   audio * 32768.0 - 0.5).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(audio.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())


def read_raw(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        ch, rate, n = struct.unpack("<IIQ", f.read(16))
        data = np.frombuffer(f.read(), dtype="<f4").reshape(ch, n)
    return data.copy(), rate


def write_raw(path: str, audio: np.ndarray, sample_rate: int):
    audio = np.asarray(audio, np.float32)
    ch, n = audio.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<IIQ", ch, sample_rate, n))
        for c in range(ch):
            f.write(audio[c].astype("<f4").tobytes())
