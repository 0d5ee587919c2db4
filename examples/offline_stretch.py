"""Offline whole-file stretch (the cmd/main.cpp workflow).

    python examples/offline_stretch.py input.wav output.wav 1.25 3
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from signalsmith_stretch_tpu import SignalsmithStretch
from signalsmith_stretch_tpu.io import read_wav, write_wav


def main():
    in_path, out_path = sys.argv[1], sys.argv[2]
    time_factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    semitones = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

    audio, rate = read_wav(in_path)
    stretch = SignalsmithStretch()
    stretch.preset_default(audio.shape[0], rate)
    stretch.set_transpose_semitones(semitones, 8000 / rate)

    out, ok = stretch.exact(audio, int(round(audio.shape[1] * time_factor)))
    assert ok, "input shorter than outputSeekLength"
    write_wav(out_path, np.asarray(out), rate)
    print(f"{in_path} -> {out_path}: {time_factor}x, {semitones:+.1f} st")


if __name__ == "__main__":
    main()
