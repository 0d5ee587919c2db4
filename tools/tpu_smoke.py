#!/usr/bin/env python
"""On-TPU smoke gate: render short clips on the attached chip across the
TPU-default strategy set (pair spectra flow, merge peakmap, Pallas windowed
interp, dus sweep emission, formant banded matmul) and gate against the CPU
render of the same clips.

The phase recursion is chaotic, so sample-level equality is not expected
(docs/PARITY.md); the gates are the corpus-sweep style band-energy /
envelope measures which stay tight across backends.  Writes
tpu_smoke.json — the committed artifact a TPU-path regression would trip
(VERDICT r4 weak #4).

    python tools/tpu_smoke.py          # on the TPU attachment
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP_S = 1.0
RATE = 48000

CONFIGS = [
    ("default_1.25x", dict(time=1.25)),
    ("pitch+12", dict(time=1.25, semitones=12, tonality=8000)),
    ("formant+3c", dict(time=1.25, formant=3, formant_comp=True)),
]


def render_subprocess(platform, cfg):
    """Render in a fresh interpreter so the backend pin is honest."""
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "{platform}"
import jax
jax.config.update("jax_platforms", "{platform}")
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from signalsmith_stretch_tpu.api import SignalsmithStretch
rng = np.random.default_rng(7)
n = int({CLIP_S} * {RATE})
t = np.arange(n) / {RATE}
clip = np.stack([(0.4*np.sin(2*np.pi*220*t) + 0.2*np.sin(2*np.pi*567*t)
                 + 0.03*rng.standard_normal(n)).astype(np.float32)])
s = SignalsmithStretch(seed=3)
s.preset_default(1, {RATE})
cfg = {cfg!r}
s.set_transpose_semitones(cfg.get("semitones", 0),
                          cfg.get("tonality", 0) / {RATE})
s.set_formant_semitones(cfg.get("formant", 0), cfg.get("formant_comp", False))
out, ok = s.exact(clip, int(n * cfg["time"]))
assert ok
np.save("/tmp/tpu_smoke_{platform}.npy", np.asarray(out))
print("rendered", out.shape)
"""
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, timeout=1200)
    import numpy as np
    return np.load(f"/tmp/tpu_smoke_{platform}.npy")


def band_energy_dev(a, b, nbands=24):
    import numpy as np
    n = min(a.shape[1], b.shape[1])
    fa = np.abs(np.fft.rfft(a[0, :n]))
    fb = np.abs(np.fft.rfft(b[0, :n]))
    edges = np.linspace(0, fa.size, nbands + 1, dtype=int)
    ea = np.array([np.sum(fa[i:j] ** 2) for i, j in zip(edges, edges[1:])])
    eb = np.array([np.sum(fb[i:j] ** 2) for i, j in zip(edges, edges[1:])])
    tot = max(ea.sum(), 1e-20)
    return float(np.max(np.abs(ea - eb)) / tot)


def main():
    import numpy as np
    rows = []
    ok_all = True
    for name, cfg in CONFIGS:
        cpu = render_subprocess("cpu", cfg)
        tpu = render_subprocess("axon", cfg)
        dev = band_energy_dev(cpu, tpu)
        rms_c = float(np.sqrt(np.mean(cpu ** 2)))
        rms_t = float(np.sqrt(np.mean(tpu ** 2)))
        rms_ok = abs(rms_t - rms_c) < 0.05 * max(rms_c, 1e-9)
        finite = bool(np.all(np.isfinite(tpu)))
        ok = dev < 0.05 and rms_ok and finite
        ok_all = ok_all and ok
        rows.append(dict(config=name, band_energy_dev=round(dev, 5),
                         rms_cpu=round(rms_c, 6), rms_tpu=round(rms_t, 6),
                         finite=finite, ok=ok))
        print(json.dumps(rows[-1]), flush=True)
    report = dict(clip_seconds=CLIP_S, rate=RATE, rows=rows, ok=ok_all)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tpu_smoke.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("ok:", ok_all)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
