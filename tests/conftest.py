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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Per-platform, per-machine cache dir: entries AOT-compiled through the axon
# remote helper target different CPU features than this host (cpu_aot_loader
# warns about SIGILL risk), and entries carried over from a DIFFERENT host
# load with mismatched fma-contraction choices — one render served from the
# old machine's cache while its twin compiles fresh breaks bit-equality
# tests.  Key the dir by the host CPU flag set so a migrated workspace
# starts a fresh cache instead of mixing machines.
import hashlib  # noqa: E402


def _machine_key() -> str:
    # /proc/cpuinfo flags alone do NOT discriminate enough: two hosts with
    # the same CPU model (or AOT entries produced through the axon remote
    # helper) can share flags while XLA picks different LLVM target features
    # (+prefer-no-scatter/+prefer-no-gather) and fma contractions.  Fold in
    # the jaxlib build too, so a relocated workspace or upgraded wheel never
    # serves foreign executables into bit-equality tests.
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line)
                    break
    except OSError:
        pass
    import jaxlib  # noqa: E402
    parts.append(getattr(jaxlib, "__version__", "?"))
    parts.append(jax.__version__)
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12] \
        if parts else "unknown"


jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_cpu_" + _machine_key())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
def fresh_compile_cache(tmp_path):
    """Point the persistent compile cache at an empty per-test dir.

    Bit-equality tests (e.g. SST_SILENCE=0 vs =1) must compare executables
    compiled by THIS process on THIS machine: a persistent-cache entry
    AOT-compiled elsewhere (axon remote helper, migrated workspace) can pair
    a foreign-fma executable with a fresh local one and break bit equality.
    The machine-keyed cache dir already guards the common cases; this fixture
    removes the cache variable entirely for the tests where bitwise identity
    is the assertion."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cache"))
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


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
