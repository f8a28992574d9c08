"""Checkpoint / resume for training state (orbax-backed).

The reference has no persistence at all; its enabling property is that
``State`` is flat POD (SURVEY.md §5).  Ours is the same property taken
seriously: every state object in this framework (env batches, PPO
TrainState, plane states) is a PyTree of arrays, so checkpointing is a
single orbax call and multi-host sharded saves work unchanged.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, tree: Any) -> None:
    """Save any PyTree of arrays at ``path`` (a directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, tree, force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a PyTree saved by ``save_checkpoint``.

    ``template`` is a matching PyTree (e.g. a freshly-initialized state)
    used for structure/shape/sharding information.
    """
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, template)
    return jax.tree.map(lambda t, r: r, template, restored)
