"""Data-parallel corpus rendering over a device mesh.

The reference processes one stream per engine instance (no parallelism of any
kind — SURVEY.md §2.4); the TPU-native scaling story is batching clips along a
`data` mesh axis: vmap inside each device, sharded batch across devices over
ICI/DCN.  Rendering is embarrassingly parallel per clip, so XLA inserts no
collectives — the mesh exists so corpus batches scale linearly across chips
and pods (BASELINE config #5: 1000×10 s clips).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import engine, spectral


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(audio_batch, mesh: Mesh, axis: str = "data"):
    """Place [batch, ch, samples] with the batch axis split across the mesh."""
    return jax.device_put(audio_batch,
                          NamedSharding(mesh, P(axis, None, None)))


def batch_render(plan: engine.ExactPlan, flags: spectral.SpectralFlags,
                 mesh: Optional[Mesh] = None, axis: str = "data"):
    """Compiled batched exact() renderer: [batch, ch, in] -> [batch, ch, out].

    Per-clip PRNG seeds come from the `seeds` argument ([batch] int32), so
    >2x-stretch phase randomization decorrelates across the corpus.
    """
    def run(audio_batch, controls, seeds):
        f = functools.partial(engine.render_exact, plan=plan,
                              controls=controls, flags=flags)
        return jax.vmap(lambda a, s: f(a, seed=s))(audio_batch, seeds)

    if mesh is None:
        return jax.jit(run)
    shard = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())
    seed_shard = NamedSharding(mesh, P(axis))
    return jax.jit(run,
                   in_shardings=(shard, rep, seed_shard),
                   out_shardings=shard)
