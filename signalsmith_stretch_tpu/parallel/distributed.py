"""Multi-host (multi-process) data parallelism over DCN.

The reference engine is strictly single-stream (SURVEY.md §2.4: no threads, no
IPC anywhere in signalsmith-stretch.h); scaling to a corpus is left to the
caller.  The TPU-native story extends `parallel.batch` across hosts the JAX
way: every process runs this same program (multi-controller SPMD), connects to
a coordinator, and contributes its local chips to one global mesh.  Because
clip rendering is embarrassingly parallel, the mesh inserts **no collectives
in the render itself** — DCN only carries

  * the control-plane handshake (jax.distributed / Gloo),
  * the optional final `allgather` of rendered audio (debug / small corpora;
    production writes per-host shards straight to per-host storage).

Each host loads only its own slice of the corpus (`shard_items`), so input
audio never crosses DCN at all.

Usage (same program on every host):

    from signalsmith_stretch_tpu.parallel import distributed as dist
    dist.initialize()                      # env-driven; no-op single-process
    mesh = dist.global_mesh()
    mine = dist.shard_items(all_items)     # per-host corpus slice
    fn = batch.batch_render(plan, flags, mesh=mesh)
    x = dist.global_batch(local_audio, mesh)        # [global_b, ch, n]
    seeds = dist.global_batch(local_seeds, mesh)
    out = fn(x, controls, seeds)           # addressable shards are local
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Connect this process to the multi-host job.

    Arguments fall back to SST_COORDINATOR / SST_NUM_PROCESSES / SST_PROCESS_ID
    (and from there to JAX's own autodetection: TPU pod metadata, or the
    standard JAX_COORDINATOR_ADDRESS family).  With no configuration at all
    this is a no-op and the session stays single-process — every downstream
    helper degrades to the `parallel.batch` behavior.

    Returns True iff a multi-process runtime is (now) active.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "SST_COORDINATOR") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("SST_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("SST_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None:
        return False  # single-process session
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def global_mesh(axis: str = "data") -> Mesh:
    """One mesh over every chip of every process, data axis = all devices.

    Device order is jax.devices() (process-major), so a global batch axis
    sharded over `axis` gives each host a contiguous run of clips — matching
    `shard_items`' contiguous split.
    """
    return Mesh(np.array(jax.devices()), (axis,))


def shard_items(items: Sequence, index: Optional[int] = None,
                count: Optional[int] = None) -> List:
    """Contiguous per-host slice of a corpus list.

    Every host calls this on the SAME logically-ordered listing (e.g. sorted
    filenames) and loads only its own share; clip audio therefore never
    crosses DCN.  Contiguous (not round-robin) so the global batch axis of
    `global_batch` lines up with `global_mesh`'s process-major device order.
    """
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    n = len(items)
    lo = (n * index) // count
    hi = (n * (index + 1)) // count
    return list(items[lo:hi])


def global_batch(local: np.ndarray, mesh: Mesh, axis: str = "data"):
    """Assemble a global [global_batch, ...] array from each process's local
    [local_batch, ...] block (batch axis sharded over `axis`, rest replicated).

    Single-process this is just a device_put with the mesh sharding.
    """
    spec = P(axis, *([None] * (np.ndim(local) - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def allgather(x) -> np.ndarray:
    """Gather a sharded result to every host (debug / small corpora only —
    this is the one audio-sized DCN transfer in the pipeline)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
