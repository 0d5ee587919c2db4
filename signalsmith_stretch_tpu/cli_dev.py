"""Dev/regression CLI: the cmd/main-dev.cpp equivalent.

    python -m signalsmith_stretch_tpu.cli_dev input out.raw --time=1.25 ...

Adds on top of the regular CLI (cmd/main-dev.cpp:60-233 feature map):
  - setup/process timing with realtime factor
  - golden-file regression: first render is snapshotted as
    <output>.reference; later runs hard-fail above -60 dB RMS deviation
    (only for time <= 1.6, outside the randomized-phase regime — same rule as
    the reference, :98)
  - per-stage timing breakdown rendered to profile.svg
  - re-trace guard: the hot path must compile exactly once (the reference's
    no-allocation invariant, :160-163)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

# same SST_PLATFORM pinning as cli.py (site startup hooks can overwrite
# JAX_PLATFORMS before main() runs)
_plat = os.environ.get("SST_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="signalsmith-stretch-tpu-dev")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--time", type=float, default=1.0)
    p.add_argument("--semitones", type=float, default=0)
    p.add_argument("--tonality", type=float, default=8000)
    p.add_argument("--formant", type=float, default=0)
    p.add_argument("--formant-comp", action="store_true")
    p.add_argument("--formant-base", type=float, default=0)
    p.add_argument("--cheaper", action="store_true")
    p.add_argument("--split", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--raw", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="write per-stage timing to profile.svg")
    p.add_argument("--no-reference", action="store_true",
                   help="skip the golden-file regression check")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .io import read_raw, read_wav, write_raw, write_wav
    from .models import StretchModel
    from .utils import profiling

    reader = read_raw if args.raw else read_wav
    writer = write_raw if args.raw else write_wav
    audio, rate = reader(args.input)
    in_len = audio.shape[1]
    out_len = int(round(in_len * args.time))

    t0 = time.perf_counter()
    model = StretchModel.build(
        channels=audio.shape[0], sample_rate=rate, in_samples=in_len,
        out_samples=out_len, semitones=args.semitones,
        tonality_hz=args.tonality, formant_semitones=args.formant,
        formant_compensation=args.formant_comp,
        formant_base_hz=args.formant_base, cheaper=args.cheaper,
        split=args.split)
    setup_s = time.perf_counter() - t0
    print(f"Setup:\n\t{setup_s:.3f}s")

    guard = profiling.RetraceGuard(lambda a: model(a, args.seed))
    x = jax.device_put(jnp.asarray(audio))
    profiling.sync(guard.jitted(x))  # compile
    t0 = time.perf_counter()
    out = guard.jitted(x)
    profiling.sync(out)
    process_s = time.perf_counter() - t0
    guard.jitted(x)
    guard.check(1)

    audio_s = in_len / rate
    print(f"Process:\n\t{process_s:.3f}s, {audio_s / process_s:.1f}x realtime, "
          f"{100 * process_s / audio_s:.2f}% of one core-second/s")
    print("\tre-trace guard: ok (compiled once)")

    out_np = np.asarray(out)
    writer(args.output, out_np, rate)

    if args.profile:
        # per-step breakdown (cmd/main-dev.cpp:165-208): cumulative jitted
        # prefixes of the pipeline, differenced into per-stage bars
        xb = x[None]
        seeds = jnp.full((1,), args.seed, jnp.int32)
        times = profiling.stage_breakdown(model, xb, seeds)
        for name, v in times.items():
            print(f"\t{name:14s} {v * 1e3:9.2f} ms")
        profiling.write_svg_bars(
            "profile.svg", {k: v * 1000 for k, v in times.items()},
            title=f"{os.path.basename(args.input)} @ {args.time}x")
        print("\tprofile.svg written")

    # golden-file regression (cmd/main-dev.cpp:97-103, 212-233)
    if not args.no_reference and args.time <= 1.6:
        ref_path = args.output + ".reference.npy"
        if os.path.exists(ref_path):
            ref = np.load(ref_path)
            if ref.shape != out_np.shape:
                print("Reference:\n\tlengths differ", file=sys.stderr)
                return 1
            diff2 = float(np.mean((ref.astype(np.float64) - out_np) ** 2))
            diff_db = 10 * np.log10(diff2 + 1e-300)
            print(f"Reference:\n\tdifference: {diff_db:.1f} dB")
            if diff_db > -60:
                print("too much difference", file=sys.stderr)
                return 1
        else:
            np.save(ref_path, out_np)
            print(f"Reference:\n\tsnapshotted {ref_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
