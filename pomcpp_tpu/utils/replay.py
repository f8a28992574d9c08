"""Trajectory recording and replay.

The reference's only observability hooks are the rendered game loop and
``SetStepListener`` (environment.cpp:210-213).  Here a recorded game is just
data: stack the per-step plane states (any PyTree of arrays) and the moves,
save as npz, replay through the host renderer at will.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def record_game(game0, step_fn, moves_fn, n_steps: int):
    """Roll a single game, stacking every state.

    ``step_fn(game, moves) -> game``; ``moves_fn(t, game) -> i32[4]``.
    Returns ``(states_stacked, moves[T, 4])`` where states have a leading
    time axis of length ``n_steps + 1`` (initial state included).
    """
    states = [game0]
    moves_hist = []
    game = game0
    for t in range(n_steps):
        mv = moves_fn(t, game)
        moves_hist.append(np.asarray(mv))
        game = step_fn(game, mv)
        states.append(game)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return stacked, np.stack(moves_hist)


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to bare paths; normalize so a record/view
    round-trip with the same path string works."""
    return path if path.endswith(".npz") else path + ".npz"


def save_replay(path: str, states, moves) -> None:
    """Save a recorded game (or any stacked PyTree) + moves as one npz."""
    path = _npz_path(path)
    leaves = jax.tree.leaves(states)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        moves=np.asarray(moves),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_replay(path: str, template: Any):
    """Load a replay against a single-state ``template`` PyTree.

    Returns ``(states_stacked, moves)``.  The template supplies the tree
    structure of ONE state; leaves are validated against it (count and
    per-step shape) so a replay recorded from a different state type
    fails loudly instead of unflattening into the wrong fields.
    """
    data = np.load(_npz_path(path))
    leaves, treedef = jax.tree.flatten(template)
    n_saved = len([k for k in data.files if k.startswith("leaf_")])
    if n_saved != len(leaves):
        raise ValueError(
            f"replay at {path} has {n_saved} leaves but the template has "
            f"{len(leaves)} -- recorded from a different state type?"
        )
    loaded = []
    for i, l in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape[1:]) != tuple(np.shape(l)):
            raise ValueError(
                f"replay leaf_{i} per-step shape {tuple(arr.shape[1:])} does "
                f"not match template shape {tuple(np.shape(l))}"
            )
        loaded.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, loaded), data["moves"]


def replay_frame(states, t: int):
    """Extract the single state at time ``t`` from a stacked replay."""
    return jax.tree.map(lambda x: x[t], states)
