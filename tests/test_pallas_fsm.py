"""In-kernel SimpleAgent FSM vs the cellular-toolkit FSM (interpret mode).

The chunk kernel's policy="simple" path (engine/pallas_fsm.py) must produce
the exact move stream of agents/simple_cellular.simple_agent_cell_act when
driven by the same rand draws -- SWAR BFS tie-breaks, ring/moveQueue
persistence quirks and all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.agents.simple import simple_agent_init
from pomcpp_tpu.agents.simple_cellular import simple_agent_cell_act
from pomcpp_tpu.core.board_gen import random_cell_state
from pomcpp_tpu.engine.cellular import CellState, cellular_step
from pomcpp_tpu.engine.pallas_step import (
    pallas_rollout_chunk,
    simple_fsm_state_init,
)
from pomcpp_tpu.strategy.cellular_toolkit import danger_map_cell


def _joint_with_rands(cs, asts, rands):
    """simple_agent_cell_joint but with an injected rand vector."""
    dmap = danger_map_cell(cs)
    ids = jnp.arange(4, dtype=jnp.int32)
    moves, _, asts2 = jax.vmap(
        lambda aid, ast, rand: simple_agent_cell_act(cs, aid, ast, rand, dmap)
    )(ids, asts, rands)
    return moves, asts2


@pytest.mark.parametrize("seed", [0, 3])
def test_fsm_kernel_matches_cellular_fsm(seed):
    steps, b = 12, 4
    keys = jax.random.split(jax.random.PRNGKey(seed), b)
    csb = jax.vmap(random_cell_state)(keys)
    rng = np.random.RandomState(seed + 100)
    rands = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)

    got, mrec, drec, _ = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, policy="simple",
        moves=rands, record=True, auto_reset=False,
        fsm_state=simple_fsm_state_init(b),
    )
    mrec = np.asarray(mrec)

    # Replay through the XLA cellular FSM with the same rand stream.
    joint_v = jax.jit(jax.vmap(_joint_with_rands))
    step_v = jax.jit(jax.vmap(cellular_step))
    ast0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b, 4) + x.shape), simple_agent_init()
    )
    cs, asts = csb, ast0
    for t in range(steps):
        mv, asts = joint_v(cs, asts, rands[t])
        mv = jnp.where(cs.agent_dead, 0, mv).astype(jnp.int32)
        assert np.array_equal(np.asarray(mv), mrec[t]), (
            f"step {t}: FSM moves diverge:\n kernel {mrec[t]}\n "
            f"cellular {np.asarray(mv)}"
        )
        cs = step_v(cs, mv)

    for name in CellState._fields:
        if name == "timestep":
            continue
        a = np.asarray(getattr(got, name))
        bb = np.asarray(getattr(cs, name))
        assert np.array_equal(a, bb), f"final state field {name} differs"


def test_fsm_kernel_dead_agent_stale_sources():
    """SWAR-borrow regression: a dead agent's stale BFS source sits on a
    WALKABLE cell; its distance field holds 0 there and a subtractive
    source-override borrows into the next agent's byte, propagating fake
    distances (caught by the on-TPU replay validation).  Kill two agents
    and demand move-exactness for the survivors."""
    steps, b = 10, 4
    keys = jax.random.split(jax.random.PRNGKey(9), b)
    csb = jax.vmap(random_cell_state)(keys)
    # Agents 0 and 1 die in place; their cells revert to passage.
    lane = jnp.arange(121)
    board = csb.board
    for i in (0, 1):
        cell = (csb.agent_x[:, i] + 11 * csb.agent_y[:, i])[:, None]
        board = jnp.where(lane[None] == cell, 0, board)
    dead = jnp.zeros((b, 4), bool).at[:, :2].set(True)
    csb = csb._replace(
        board=board, agent_dead=dead,
        alive_count=jnp.full((b,), 2, jnp.int32),
    )
    rng = np.random.RandomState(77)
    rands = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)

    got, mrec, _, _ = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, policy="simple",
        moves=rands, record=True, auto_reset=False,
        fsm_state=simple_fsm_state_init(b),
    )
    mrec = np.asarray(mrec)

    joint_v = jax.jit(jax.vmap(_joint_with_rands))
    step_v = jax.jit(jax.vmap(cellular_step))
    ast0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b, 4) + x.shape), simple_agent_init()
    )
    cs, asts = csb, ast0
    for t in range(steps):
        mv, asts = joint_v(cs, asts, rands[t])
        mv = jnp.where(cs.agent_dead, 0, mv).astype(jnp.int32)
        assert np.array_equal(np.asarray(mv), mrec[t]), (
            f"step {t}: kernel {mrec[t]} vs cellular {np.asarray(mv)}"
        )
        cs = step_v(cs, mv)


def test_mixed_control_env_step_matches_xla_composition():
    """env_step_auto_reset_batch_fsm (in-kernel FSM opponents + injected
    learner moves, interpret mode) == XLA composition: toolkit-FSM moves
    for opponent lanes, the injected move for the learner lane, stepped
    through env_step_auto_reset_batch."""
    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.env.environment import (
        env_step_auto_reset_batch,
        env_step_auto_reset_batch_fsm,
    )

    steps, b, slots = 8, 4, (0,)
    keys = jax.random.split(jax.random.PRNGKey(11), b)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(keys)
    rng = np.random.RandomState(211)
    rands = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)
    learner = jnp.asarray(rng.randint(0, 6, size=(steps, b, 4)), jnp.int32)

    # Kernel side.
    es_k = es
    fsm = simple_fsm_state_init(b)
    for t in range(steps):
        es_k, fsm = env_step_auto_reset_batch_fsm(
            es_k, learner[t], fsm, slots, 0,
            interpret=True, rand_moves=rands[t],
        )

    # XLA side: same rand stream through the toolkit FSM, learner lane
    # overridden, stepped through the plain batched env step.
    joint_v = jax.jit(jax.vmap(_joint_with_rands))
    ast0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b, 4) + x.shape), simple_agent_init()
    )
    es_x, asts = es, ast0
    lane = jnp.arange(4)
    for t in range(steps):
        mv, asts = joint_v(es_x.game, asts, rands[t])
        mv = jnp.where(lane[None] == slots[0], learner[t], mv)
        mv = jnp.where(es_x.game.agent_dead, 0, mv).astype(jnp.int32)
        es_x = env_step_auto_reset_batch(es_x, mv)

    assert not bool(np.asarray(es_k.done).any())  # no episode in 8 steps
    for name in CellState._fields:
        a = np.asarray(getattr(es_k.game, name))
        bb = np.asarray(getattr(es_x.game, name))
        assert np.array_equal(a, bb), f"game field {name} differs"
    for name in ("done", "winner", "is_draw"):
        assert np.array_equal(
            np.asarray(getattr(es_k, name)), np.asarray(getattr(es_x, name))
        )


def test_fsm_kernel_bfs_exact_beyond_40_rounds():
    """Serpentine board: the enemy is 6 manhattan away but 46 walkable
    steps away.  The in-kernel SWAR BFS must still relax to convergence
    (its round cap covers the worst-case shortest path, NUM_CELLS), or
    the enemy reads unreachable and the approach branch silently
    diverges from the toolkit's run-to-convergence fill_reach_map."""
    from pomcpp_tpu.core.constants import C_RIGID
    from pomcpp_tpu.core.state import empty_state, put_agent, put_item
    from pomcpp_tpu.engine.cellular import from_state
    from pomcpp_tpu.strategy.cellular_toolkit import fill_reach_map

    s = empty_state()
    # Walls down columns 1/3/5 with alternating openings: the corridor
    # snakes (0,0) -> (0,10) -> (2,10) -> (2,0) -> (4,0) -> (4,10) -> (6,10)
    # -> (6,0).
    for y in range(10):
        s = put_item(s, 1, y, C_RIGID)       # col 1 open only at y=10
        s = put_item(s, 5, y, C_RIGID)       # col 5 open only at y=10
    for y in range(1, 11):
        s = put_item(s, 3, y, C_RIGID)       # col 3 open only at y=0
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 6, 0, 1)
    s = put_agent(s, 8, 10, 2)
    s = put_agent(s, 10, 10, 3)
    cs = from_state(s)

    # Self-check the scenario: walk distance to the enemy exceeds the old
    # 40-round cap while manhattan (6) is inside the approach trigger (7).
    rmap = fill_reach_map(cs, 0)
    enemy_cell = 6 + 11 * 0
    assert int(rmap.dist[enemy_cell]) == 46

    b = 2
    csb = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), cs)
    rng = np.random.RandomState(7)
    steps = 3
    rands = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)

    _, mrec, _, _ = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, policy="simple",
        moves=rands, record=True, auto_reset=False,
        fsm_state=simple_fsm_state_init(b),
    )
    mrec = np.asarray(mrec)

    joint_v = jax.jit(jax.vmap(_joint_with_rands))
    step_v = jax.jit(jax.vmap(cellular_step))
    asts = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b, 4) + x.shape), simple_agent_init()
    )
    csx = csb
    for t in range(steps):
        mv, asts = joint_v(csx, asts, rands[t])
        mv = jnp.where(csx.agent_dead, 0, mv).astype(jnp.int32)
        assert np.array_equal(np.asarray(mv), mrec[t]), (
            f"step {t}: kernel {mrec[t]} vs cellular {np.asarray(mv)}"
        )
        csx = step_v(csx, mv)


@pytest.mark.parametrize("seed", [21, 22])
def test_fsm_kernel_close_quarters_fuzz(seed):
    """Generated boards start agents in corners (>7 manhattan apart), so
    the aggression branches (bomb-adjacent, RP-loop random, approach)
    never fire in the first steps and their quirks hide from the
    generated-board equivalence tests.  Teleport all four agents into a
    5x5 window and demand kernel/toolkit move-exactness through the
    ensuing close combat (bombs, fleeing, early RP-loop stale reads)."""
    steps, b = 16, 6
    keys = jax.random.split(jax.random.PRNGKey(seed), b)
    csb = jax.vmap(random_cell_state)(keys)

    rng = np.random.RandomState(seed)
    lane = jnp.arange(121)
    board = csb.board
    # Clear the original agent cells.
    for i in range(4):
        cell = (csb.agent_x[:, i] + 11 * csb.agent_y[:, i])[:, None]
        board = jnp.where(lane[None] == cell, 0, board)
    # Drop the agents on distinct cells of a random 5x5 window per board.
    nx = np.zeros((b, 4), np.int32)
    ny = np.zeros((b, 4), np.int32)
    for g in range(b):
        ox, oy = rng.randint(0, 7, size=2)
        cells = rng.choice(25, size=4, replace=False)
        nx[g] = ox + cells % 5
        ny[g] = oy + cells // 5
    from pomcpp_tpu.core.constants import C_AGENT0
    for i in range(4):
        cell = jnp.asarray(nx[:, i] + 11 * ny[:, i])[:, None]
        board = jnp.where(lane[None] == cell, C_AGENT0 + i, board)
    csb = csb._replace(
        board=board,
        agent_x=jnp.asarray(nx), agent_y=jnp.asarray(ny),
    )

    rands = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)
    got, mrec, _, _ = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, policy="simple",
        moves=rands, record=True, auto_reset=False,
        fsm_state=simple_fsm_state_init(b),
    )
    mrec = np.asarray(mrec)

    joint_v = jax.jit(jax.vmap(_joint_with_rands))
    step_v = jax.jit(jax.vmap(cellular_step))
    asts = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b, 4) + x.shape), simple_agent_init()
    )
    cs = csb
    for t in range(steps):
        mv, asts = joint_v(cs, asts, rands[t])
        mv = jnp.where(cs.agent_dead, 0, mv).astype(jnp.int32)
        assert np.array_equal(np.asarray(mv), mrec[t]), (
            f"step {t}: kernel {mrec[t]} vs cellular {np.asarray(mv)}"
        )
        cs = step_v(cs, mv)
    for name in CellState._fields:
        if name == "timestep":
            continue
        assert np.array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(cs, name))
        ), f"final state field {name} differs"
