"""Stream-state checkpointing (SURVEY.md §5 checkpoint/resume).

The engine state is an explicit pytree (streaming.StreamState), so
checkpointing is serialization: orbax when available, a portable npz fallback
otherwise.  Complex leaves are split into float pairs because some backends
cannot transfer complex arrays to the host.
"""
from __future__ import annotations

import numpy as np

import jax


def _to_host(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(jax.device_get(leaf))
        if np.iscomplexobj(arr):
            out[f"{i}_re"] = arr.real.astype(np.float32)
            out[f"{i}_im"] = arr.imag.astype(np.float32)
        else:
            out[str(i)] = arr
    return out, treedef


def save(path: str, state) -> None:
    data, _ = _to_host(state)
    np.savez(path, **data)


def load(path: str, template):
    """Restore a state saved by save(); `template` supplies the tree
    structure (e.g. a freshly-initialized state)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as z:
        new = []
        for i, leaf in enumerate(leaves):
            if f"{i}_re" in z:
                new.append((z[f"{i}_re"] + 1j * z[f"{i}_im"]).astype(np.complex64))
            else:
                new.append(z[str(i)])
    return jax.tree_util.tree_unflatten(treedef, new)


def save_orbax(path: str, state) -> None:  # pragma: no cover - optional dep
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(path, jax.device_get(state))


def load_orbax(path: str):  # pragma: no cover - optional dep
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer().restore(path)
