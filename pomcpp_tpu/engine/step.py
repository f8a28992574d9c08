"""The forward step kernel: ``step(state, moves) -> state``.

TPU-native equivalent of ``bboard::Step`` (reference src/bboard/step.cpp:9-284).
Pure, jittable, vmappable.  Phase order is the spec:

  0. tick flames (expire & reveal powerups)
  1. simultaneous agent movement (dependency-chain walk)
  2. bomb kinematics (block pass with bounce-back, then move pass)
  3. tick bombs (queue-front explosions, chained)

Like the reference, this function does NOT advance ``timestep`` -- the
environment wrapper does (environment.cpp:150).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import State
from . import util
from .bombs import bomb_block_pass, bomb_move_pass
from .flames import tick_bombs, tick_flames
from .movement import move_agents


def step(state: State, moves) -> State:
    """Apply one simultaneous step.  ``moves`` is i32[4] of move codes."""
    moves = jnp.asarray(moves, jnp.int32)

    # Phase 0: flames (step.cpp:15).
    state = tick_flames(state)

    # Old positions, captured before movement (step.cpp:21-24).
    old_x = state.agent_x
    old_y = state.agent_y

    # Phase 1: agent movement (step.cpp:26-185).
    state, _, _ = move_agents(state, moves)

    # Phase 2: bomb kinematics (step.cpp:187-278).
    state = util.reset_bomb_flags(state)
    bdest_x, bdest_y = util.fill_bomb_dest(state)
    state = bomb_block_pass(state, moves, bdest_x, bdest_y, old_x, old_y)
    state = bomb_move_pass(state, moves, bdest_x, bdest_y)

    # Phase 3: explosions (step.cpp:283).
    state = tick_bombs(state)
    return state
