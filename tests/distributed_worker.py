"""Worker program for the 2-process DCN test (run via subprocess).

Every process runs this same program (multi-controller SPMD): connect to the
coordinator, build the global 8-device mesh (4 local CPU devices x 2
processes), shard a deterministic 8-clip corpus per host, render the global
batch data-parallel, allgather, and compare against a local single-process
render of the full batch.  Prints "DIST_OK <pid>" on success.

Usage: python distributed_worker.py <port> <process_id> <num_processes>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           + os.environ.get("XLA_FLAGS", ""))
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from signalsmith_stretch_tpu import engine, spectral  # noqa: E402
from signalsmith_stretch_tpu.config import StretchConfig  # noqa: E402
from signalsmith_stretch_tpu.parallel import batch as pbatch  # noqa: E402
from signalsmith_stretch_tpu.parallel import distributed as dist  # noqa: E402


def rel_err_db(a, b):
    num = float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))
    den = float(np.sqrt(np.mean(np.asarray(b) ** 2))) + 1e-30
    return 20 * np.log10(num / den + 1e-30)


def main():
    port, pid, nprocs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    assert dist.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)
    assert dist.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    rate = 8000
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    plan = engine.build_exact_plan(cfg, 8000, 10000)
    flags = spectral.SpectralFlags(False, False, False)
    controls = spectral.Controls.make()

    # deterministic corpus, identical on every host; each loads only its slice
    rng = np.random.default_rng(7)
    t = np.arange(8000) / rate
    base = 0.4 * np.sin(2 * np.pi * 220 * t, dtype=np.float64)
    clips = (base[None, None] + 0.01 * rng.standard_normal((8, 1, 8000))
             ).astype(np.float32)
    seeds = np.arange(8, dtype=np.int32)

    mine = dist.shard_items(list(range(8)))
    assert mine == list(range(4 * pid, 4 * pid + 4)), mine

    mesh = dist.global_mesh()
    fn = pbatch.batch_render(plan, flags, mesh=mesh)
    x = dist.global_batch(clips[mine], mesh)
    s = dist.global_batch(seeds[mine], mesh)
    out = fn(x, controls, s)
    got = dist.allgather(out)
    assert got.shape == (8, 1, 10000), got.shape

    # local single-process reference render of the full batch
    plain = pbatch.batch_render(plan, flags)
    want = np.asarray(plain(jnp.asarray(clips), controls, jnp.asarray(seeds)))
    db = rel_err_db(got, want)
    assert db < -55, db
    print(f"DIST_OK {pid} {db:.1f}dB", flush=True)


if __name__ == "__main__":
    main()
