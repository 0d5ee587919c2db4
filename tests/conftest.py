"""Test fixtures: CPU backend with 8 virtual devices, oracle build, helpers."""
import os
import struct
import subprocess

# Force CPU + fake multi-device mesh before jax import (SURVEY.md §4: the
# standard fake-multi-device recipe for sharding tests).  NOTE: the axon TPU
# sitecustomize sets JAX_PLATFORMS=axon at interpreter startup, so we must
# overwrite (not setdefault) and also pin it via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# CRITICAL for the suite's bit-equality gates: multi-threaded Eigen
# contractions on the CPU backend are EXECUTION-nondeterministic — when the
# contraction dim is sharded across threads, partial sums combine in thread
# completion order, so the SAME executable on the SAME inputs returns
# different bits call to call (measured: 9/119 renders mismatched without
# this flag, 0/119 with it; tools/exp_cpu_determinism.py).  This — not
# compile-cache poisoning or fma-contraction drift — was the root cause of
# the order-dependent test failures in rounds 1-3: any dot-heavy render had
# a ~5-10% chance of flipping a few low bits, and the phase recursion
# amplified them to ~1e-5.
if "multi_thread_eigen" not in flags:
    flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache for the test suite.  Measured on this jax
# (0.9.0, CPU): an executable RELOADED from the persistent cache computes
# bitwise differently from the in-memory JIT compile that wrote it — same
# process, same machine (the cache stores an AOT-pipeline serialization
# whose fma contraction differs; a 12-iteration quadratic-map canary
# diverges to NaN between the two).  Round 2's machine-keyed cache dirs
# could never fix this: ANY mix of loaded and fresh executables breaks the
# suite's bit-equality gates, and which renders load vs compile depends on
# test order — the exact flakiness the cache-poisoning failures showed.
# CPU test compiles are modest; correctness wins.
jax.config.update("jax_compilation_cache_dir", None)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = os.path.join(REPO, "oracle", "oracle")

# Build the native _sstio extension if it isn't importable yet, so
# tests/test_components.py runs instead of silently skipping on a fresh
# checkout (the wheel build does this too; here it's one g++ invocation).
try:
    import signalsmith_stretch_tpu._sstio  # noqa: F401
except ImportError:
    try:
        subprocess.run(["make"], cwd=os.path.join(REPO, "native"),
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pass   # no toolchain: the importorskip in test_components handles it


@pytest.fixture()
def fresh_compile_cache():
    """Assert the persistent compile cache is disabled for bit-equality tests.

    Executables loaded from the persistent cache compute bitwise differently
    from in-process JIT compiles (see the module-level note), so any test
    whose assertion is bitwise identity between two renders must have every
    involved program compiled fresh in-process.  The suite disables the
    cache globally; this fixture documents and enforces that requirement at
    the tests that depend on it."""
    assert jax.config.jax_compilation_cache_dir is None, \
        "bit-equality tests require the persistent compile cache disabled"
    yield


@pytest.fixture(scope="session")
def oracle_bin():
    if not os.path.exists(ORACLE):
        subprocess.run(["make"], cwd=os.path.join(REPO, "oracle"), check=True)
    return ORACLE


def write_raw(path, data, rate):
    ch, n = data.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<IIQ", ch, rate, n))
        for c in range(ch):
            f.write(np.asarray(data[c], "<f4").tobytes())


def read_raw(path):
    with open(path, "rb") as f:
        ch, rate, n = struct.unpack("<IIQ", f.read(16))
        return np.frombuffer(f.read(), dtype="<f4").reshape(ch, n).copy(), rate


def rel_err_db(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return 10 * np.log10(np.mean((a - b) ** 2) / (np.mean(b ** 2) + 1e-30) + 1e-30)


@pytest.fixture(scope="session")
def test_signal():
    """3s mono 8kHz harmonic test signal (fast configs for CI-speed tests)."""
    rng = np.random.default_rng(1)
    rate = 8000
    t = np.arange(rate * 3) / rate
    sig = (0.4 * np.sin(2 * np.pi * 110 * t)
           + 0.2 * np.sin(2 * np.pi * 220 * t + 0.3)
           + 0.1 * np.sin(2 * np.pi * 555 * t + 1.0)
           + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    return sig[None, :], rate


@pytest.fixture(scope="session")
def stereo_signal():
    rng = np.random.default_rng(2)
    rate = 8000
    t = np.arange(rate * 2) / rate
    l = (0.4 * np.sin(2 * np.pi * 165 * t)
         + 0.1 * np.sin(2 * np.pi * 660 * t)
         + 0.02 * rng.standard_normal(t.shape))
    r = (0.35 * np.sin(2 * np.pi * 165 * t + 0.5)
         + 0.12 * np.sin(2 * np.pi * 495 * t)
         + 0.02 * rng.standard_normal(t.shape))
    return np.stack([l, r]).astype(np.float32), rate


def run_oracle(oracle_bin, tmpdir, sig, rate, mode="exact", time_f=1.0,
               semitones=0.0, tonality=0.0, formant=0.0, formant_comp=False,
               formant_base=0.0, cheaper=True, split=False, seed=1, chunk=None,
               block=None, interval=None):
    inp = os.path.join(tmpdir, "in.raw")
    outp = os.path.join(tmpdir, "out.raw")
    write_raw(inp, sig, rate)
    args = [oracle_bin, "--raw", inp, outp, f"--mode={mode}", f"--time={time_f}",
            f"--semitones={semitones}", f"--tonality={tonality}",
            f"--formant={formant}", f"--formant-base={formant_base}",
            f"--seed={seed}"]
    if formant_comp:
        args.append("--formant-comp")
    if cheaper:
        args.append("--cheaper")
    if split:
        args.append("--split")
    if chunk is not None:
        args.append(f"--chunk={chunk}")
    if block is not None:
        args += [f"--block={block}", f"--interval={interval}"]
    subprocess.run(args, check=True)
    out, _ = read_raw(outp)
    return out
