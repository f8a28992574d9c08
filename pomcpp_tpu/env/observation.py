"""Fog-of-war observations: pure ``observe(game, agent_id) -> planes``.

The reference *declares* fog (Item::FOG, bboard.hpp:62) but never implements
it; the AgentInfo docstring explains stats were bundled so fog could hide
them (bboard.hpp:213-227).  This module completes that design TPU-natively:
observation is a pure masking/cropping function over the plane state, so
policies and learners stay jitted end-to-end (no host round trip).

Two forms:
* ``observe``      -- full-board planes with cells outside the view radius
                      replaced by FOG / zeros (classic Pommerman 9x9 view).
* ``observe_ego``  -- egocentric fixed-size crop (2R+1 square) with
                      out-of-board cells marked RIGID, the standard learner
                      input layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import BOARD_SIZE, C_FOG, C_RIGID, NUM_CELLS
from ..core.state import I32
from ..engine.cellular import CellState

DEFAULT_VIEW_RANGE = 4  # classic Pommerman: a 9x9 window


class Observation(NamedTuple):
    """Per-agent view; all planes flat [121] (or [(2R+1)^2] for ego crops)."""

    board: jax.Array        # item classes, C_FOG outside the view
    bomb_timer: jax.Array   # 0 outside the view
    bomb_strength: jax.Array
    bomb_dir: jax.Array
    flame_timer: jax.Array
    position: jax.Array     # i32[2] own (x, y)
    max_bombs: jax.Array    # own stats (visible to self only)
    bomb_count: jax.Array
    strength: jax.Array
    can_kick: jax.Array
    alive: jax.Array        # bool[4] public liveness
    teammate: jax.Array     # i32 teammate id or -1 (FFA)


def _view_mask(x, y, view_range: int):
    idx = jnp.arange(NUM_CELLS, dtype=I32)
    cx = idx % BOARD_SIZE
    cy = idx // BOARD_SIZE
    return (jnp.abs(cx - x) <= view_range) & (jnp.abs(cy - y) <= view_range)


def observe(
    game: CellState,
    agent_id,
    view_range: int = DEFAULT_VIEW_RANGE,
    teammate=-1,
) -> Observation:
    """Full-board fogged view for one agent (vmap over agents/boards)."""
    x = game.agent_x[agent_id]
    y = game.agent_y[agent_id]
    seen = _view_mask(x, y, view_range)
    mask = lambda p, fill=0: jnp.where(seen, p, fill).astype(I32)
    return Observation(
        board=mask(game.board, C_FOG),
        bomb_timer=mask(game.bomb_timer),
        bomb_strength=mask(game.bomb_strength),
        bomb_dir=mask(game.bomb_dir),
        flame_timer=mask(game.flame_timer),
        position=jnp.stack([x, y]).astype(I32),
        max_bombs=game.agent_max_bombs[agent_id],
        bomb_count=game.agent_bomb_count[agent_id],
        strength=game.agent_strength[agent_id],
        can_kick=game.agent_can_kick[agent_id],
        alive=~game.agent_dead,
        teammate=jnp.asarray(teammate, I32),
    )


def observe_ego(
    game: CellState,
    agent_id,
    view_range: int = DEFAULT_VIEW_RANGE,
    teammate=-1,
) -> Observation:
    """Egocentric (2R+1)x(2R+1) crop; off-board cells read RIGID."""
    r = view_range
    w = 2 * r + 1
    x = game.agent_x[agent_id]
    y = game.agent_y[agent_id]

    # Gather-free crop: under vmap a dynamic_slice with traced starts
    # lowers to per-element gathers, which TPU serializes (measured: the
    # crop dominated PPO rollouts).  One-hot row/column selection matmuls
    # batch cleanly instead; f32 accumulation of small ints is exact.
    pw = BOARD_SIZE + 2 * r
    rows = jax.nn.one_hot(y + jnp.arange(w), pw, dtype=jnp.float32)
    cols = jax.nn.one_hot(x + jnp.arange(w), pw, dtype=jnp.float32)

    def crop(plane, fill):
        p = plane.reshape(BOARD_SIZE, BOARD_SIZE)
        p = jnp.pad(p, r, constant_values=fill).astype(jnp.float32)
        out = rows @ p @ cols.T
        return out.reshape(w * w).astype(I32)

    return Observation(
        board=crop(game.board, C_RIGID),
        bomb_timer=crop(game.bomb_timer, 0),
        bomb_strength=crop(game.bomb_strength, 0),
        bomb_dir=crop(game.bomb_dir, 0),
        flame_timer=crop(game.flame_timer, 0),
        position=jnp.stack([x, y]).astype(I32),
        max_bombs=game.agent_max_bombs[agent_id],
        bomb_count=game.agent_bomb_count[agent_id],
        strength=game.agent_strength[agent_id],
        can_kick=game.agent_can_kick[agent_id],
        alive=~game.agent_dead,
        teammate=jnp.asarray(teammate, I32),
    )
