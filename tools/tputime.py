"""Floor-corrected TPU timing for the axon-tunneled device.

Every host->device sync through the relay costs a fixed ~26 ms round trip
(measured: a jitted sum over an 8x8 array times at 25.9 ms; a 1 GiB sum at
27.9 ms).  Timing a call with a per-call sync therefore reports
floor + device_time, which swamps sub-50 ms kernels — the round-3 stage
numbers were all inflated this way.

`timed(fn, *args)` returns (per_call_device_seconds, compile_seconds):
dispatches `reps` calls back-to-back (JAX async dispatch pipelines them on
the device) and syncs once at the end, so

    per_call = (T_pipelined - T_single) / (reps - 1)

cancels the sync floor exactly.  `fn` must return a cheap on-device scalar
(checksum) so the final float() transfer is tiny.  This matches how a
production pipeline actually runs — back-to-back batches with the host never
blocking per batch.
"""
import time


def timed(fn, *args, reps=8):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args))
        t_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        float(outs[-1])
        t_pipe = time.perf_counter() - t0
        best = min(best, (t_pipe - t_single) / (reps - 1))
    return best, compile_s


def timed_wall(fn, *args, reps=3):
    """Legacy per-call-sync timing (includes the ~26 ms relay floor)."""
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), compile_s
