#!/usr/bin/env python
"""Real-time budget check for scheduler.StretchNode quantum rendering.

The reference's worklet wrapper renders 128-sample quanta inside the audio
thread (web-wrapper.js process()); our StretchNode claims CPU-backed
real-time use.  This measures per-quantum latency against the hard budget
quantum/sample_rate and reports worst/percentile latencies plus the realtime
margin.  Run with JAX_PLATFORMS=cpu (the worklet analogue is a host path;
on the TPU attachment every quantum would pay the ~25 ms dispatch floor,
which is why the scheduler targets CPU for real-time and TPU for batch).
"""
import json
import os
import sys
import time

# the axon sitecustomize sets JAX_PLATFORMS=axon at interpreter startup:
# overwrite (not setdefault) and pin again after import
os.environ["JAX_PLATFORMS"] = os.environ.get("SST_RT_PLATFORM", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

from signalsmith_stretch_tpu.scheduler import StretchNode  # noqa: E402


def make_node(rate, quantum, preset, clip_seconds=30.0):
    node = StretchNode(rate, channels=2, quantum=quantum, preset=preset)
    t = np.arange(int(rate * clip_seconds)) / rate
    clip = np.stack([0.4 * np.sin(2 * np.pi * 220 * t),
                     0.4 * np.sin(2 * np.pi * 220 * t + 0.3)]
                    ).astype(np.float32)
    node.add_buffers(clip)
    node.start(input=0.0, rate=1.25)
    return node


def batched_main():
    """Quantum-budget table for the batched dispatch path
    (StretchNode.process_quanta / StreamingStretch.process_many): effective
    ms/quantum vs the hard real-time budget as the per-dispatch batch N
    grows.  Each dispatch still pays one full device round trip (the audio
    must come back to the host every call — a streamer cannot pipeline
    syncs away like the offline bench), so N is exactly the amortization
    lever the reference's 128-sample worklet (web-wrapper.js:215-330) does
    not need but a ~26 ms-round-trip attachment does."""
    rate = int(os.environ.get("SST_RT_RATE", "48000"))
    quantum = int(os.environ.get("SST_RT_QUANTUM", "128"))
    preset = os.environ.get("SST_RT_PRESET", "default")
    budget_ms = quantum / rate * 1e3
    rows = []
    for n_q in (1, 4, 16, 64, 256):
        node = make_node(rate, quantum, preset)
        for _ in range(3):                      # warm the jit caches
            node.process_quanta(n_q)
        lat = []
        for _ in range(12):
            t0 = time.perf_counter()
            node.process_quanta(n_q)
            lat.append(time.perf_counter() - t0)
        per_disp = float(np.median(lat)) * 1e3
        per_q = per_disp / n_q
        rows.append({
            "batch_quanta": n_q,
            "dispatch_ms": round(per_disp, 3),
            "per_quantum_ms": round(per_q, 4),
            "budget_ms": round(budget_ms, 4),
            "realtime_margin": round(budget_ms / per_q, 2),
            "latency_quanta_budget": n_q,   # audio delivered in N-quantum lumps
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"platform": os.environ["JAX_PLATFORMS"],
                      "rate": rate, "quantum": quantum, "preset": preset,
                      "rows": rows}))


def main():
    rate = int(os.environ.get("SST_RT_RATE", "48000"))
    quantum = int(os.environ.get("SST_RT_QUANTUM", "128"))
    seconds = float(os.environ.get("SST_RT_SECONDS", "4.0"))
    preset = os.environ.get("SST_RT_PRESET", "default")

    node = make_node(rate, quantum, preset, clip_seconds=8.0)

    budget = quantum / rate
    n_quanta = int(seconds * rate / quantum)
    # warmup: first quanta pay jit compiles
    for _ in range(32):
        node.process_quantum()
    lat = np.empty(n_quanta)
    for i in range(n_quanta):
        t0 = time.perf_counter()
        node.process_quantum()
        lat[i] = time.perf_counter() - t0
    lat_ms = np.sort(lat) * 1e3
    out = {
        "rate": rate, "quantum": quantum, "preset": preset,
        "budget_ms": round(budget * 1e3, 4),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 4),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 4),
        "max_ms": round(float(lat_ms[-1]), 4),
        "realtime_margin_p99": round(budget * 1e3
                                     / float(np.percentile(lat_ms, 99)), 2),
        "missed_deadlines": int((lat * 1e3 > budget * 1e3).sum()),
        "quanta": n_quanta,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--batched" in sys.argv:
        batched_main()
    else:
        main()
