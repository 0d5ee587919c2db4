"""Multi-host DCN data parallelism: 2-process CPU fake-multi-host test.

Spawns two independent Python processes (the standard JAX fake-multi-host
recipe: jax.distributed.initialize with a localhost coordinator, 4 forced CPU
devices per process = 8-device global mesh) running the same SPMD worker
program, which renders a per-host-sharded corpus batch data-parallel and
checks the allgathered result against a local single-process render.  See
signalsmith_stretch_tpu/parallel/distributed.py; the reference has no
multi-process analogue (SURVEY.md §2.4).
"""
import os
import socket
import subprocess
import sys

import pytest

from signalsmith_stretch_tpu.parallel import distributed as dist

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_render_matches_local():
    port, nprocs = _free_port(), 2
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, WORKER, str(port), str(i),
                               str(nprocs)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(nprocs)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{out[-3000:]}"
        assert f"DIST_OK {i}" in out, out[-3000:]


def test_single_process_fallbacks():
    """Without a coordinator the helpers degrade to single-process."""
    assert dist.initialize() is False          # no env configured
    assert dist.process_count() == 1
    items = list(range(10))
    assert dist.shard_items(items) == items
    mesh = dist.global_mesh()
    assert mesh.devices.size == 8              # the virtual CPU mesh
    import numpy as np
    x = dist.global_batch(np.zeros((8, 3), np.float32), mesh)
    assert dist.allgather(x).shape == (8, 3)
