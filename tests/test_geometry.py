"""Config/latency geometry parity with the reference (via oracle --info)."""
import json
import subprocess

import numpy as np
import pytest

from signalsmith_stretch_tpu import StretchConfig


@pytest.mark.parametrize("rate", [44100, 48000, 8000, 22050, 96000])
@pytest.mark.parametrize("cheaper", [False, True])
@pytest.mark.parametrize("split", [False, True])
def test_preset_geometry(oracle_bin, rate, cheaper, split, tmp_path):
    # oracle needs an input file to know the sample rate
    import struct
    inp = tmp_path / "in.raw"
    with open(inp, "wb") as f:
        f.write(struct.pack("<IIQ", 2, rate, 64))
        f.write(np.zeros(128, "<f4").tobytes())
    args = [oracle_bin, "--info", "--raw", str(inp), str(tmp_path / "o.raw"),
            "--time=1.25"]
    if cheaper:
        args.append("--cheaper")
    if split:
        args.append("--split")
    info = json.loads(subprocess.run(args, capture_output=True, text=True,
                                     check=True).stdout.splitlines()[0])
    make = StretchConfig.preset_cheaper if cheaper else StretchConfig.preset_default
    cfg = make(2, rate, split)
    assert cfg.block_samples == info["blockSamples"]
    assert cfg.interval_samples == info["intervalSamples"]
    assert cfg.input_latency == info["inputLatency"]
    assert cfg.output_latency == info["outputLatency"]
    assert cfg.seek_length == info["seekLength"]
    assert cfg.output_seek_length(np.float32(1.0 / 1.25)) == info["outputSeekLength"]


def test_derived_geometry():
    cfg = StretchConfig.preset_default(2, 48000)
    assert cfg.fft_samples == 8192
    assert cfg.bands == 4096
    assert cfg.long_vertical_step == 6
    cfg8 = StretchConfig.preset_cheaper(1, 8000)
    assert (cfg8.block_samples, cfg8.interval_samples) == (800, 320)
    assert cfg8.fft_samples == 1024
    assert cfg8.long_vertical_step == 3
