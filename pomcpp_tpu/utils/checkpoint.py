"""Checkpoint / resume for training state.

The reference has no persistence at all; its enabling property is that
``State`` is flat POD (SURVEY.md §5).  Ours is the same property taken
seriously: every state object in this framework is a PyTree of arrays, so a
checkpoint is just the flattened leaves.

Default format: a single ``.npz`` of the leaves in treedef order (restored
against a template tree).  This is synchronous, dependency-free and robust
in sandboxed single-host environments; orbax (sharding-aware, multi-host)
is available via ``backend="orbax"`` for pod-slice training.  The orbax
path uses the SYNCHRONOUS ``Checkpointer`` -- the async
``StandardCheckpointer`` commit barrier wedges in sandboxed containers
(r5: the sync handler round-trips fine, so orbax is now tested in CI
rather than self-skipping).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

_NPZ = "checkpoint.npz"


def save_checkpoint(path: str, tree: Any, backend: str = "npz") -> None:
    """Save any PyTree of arrays under directory ``path``."""
    path = os.path.abspath(path)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, args=ocp.args.StandardSave(tree))
        return
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree.leaves(tree)
    # Atomic replace: an interrupted save (preemption mid-write) must not
    # truncate the only checkpoint a later --resume depends on.
    tmp = os.path.join(path, _NPZ + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(
            f,
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
    os.replace(tmp, os.path.join(path, _NPZ))


def restore_checkpoint(path: str, template: Any, backend: str = "npz") -> Any:
    """Restore a PyTree saved by ``save_checkpoint``.

    ``template`` supplies the tree structure (e.g. a freshly-initialized
    state); leaves are loaded in flatten order.
    """
    path = os.path.abspath(path)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        restored = ckptr.restore(
            path, args=ocp.args.StandardRestore(template)
        )
        return jax.tree.map(lambda t, r: r, template, restored)
    data = np.load(os.path.join(path, _NPZ))
    leaves, treedef = jax.tree.flatten(template)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint at {path} has {len(data.files)} leaves but the "
            f"template has {len(leaves)} -- wrong model/config?"
        )
    loaded = []
    for i, l in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(l)):
            raise ValueError(
                f"checkpoint leaf_{i} shape {tuple(arr.shape)} does not match "
                f"template shape {tuple(np.shape(l))} -- wrong model/config?"
            )
        loaded.append(jax.numpy.asarray(arr).astype(l.dtype))
    return jax.tree.unflatten(treedef, loaded)
