"""Fog-of-war observation + team mode tests (reference stubs both)."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.core.constants import C_FOG, C_RIGID, C_WOOD, C_AGENT0
from pomcpp_tpu.engine.cellular import empty_cell_state
from pomcpp_tpu.env.environment import EnvState, env_step
from pomcpp_tpu.env.observation import observe, observe_ego
from pomcpp_tpu.core.state import put_agent, put_item


def _cs_with_agents():
    cs = empty_cell_state()
    cs = put_agent(cs, 5, 5, 0)
    cs = put_agent(cs, 0, 0, 1)
    cs = put_agent(cs, 10, 10, 2)
    cs = put_agent(cs, 0, 10, 3)
    return cs


def test_observe_masks_outside_radius():
    cs = _cs_with_agents()
    cs = put_item(cs, 10, 5, C_WOOD)  # 5 cells right of agent 0: hidden
    cs = put_item(cs, 8, 5, C_RIGID)  # 3 cells right: visible
    obs = jax.jit(observe)(cs, 0)
    board = np.asarray(obs.board)
    assert board[10 + 11 * 5] == C_FOG
    assert board[8 + 11 * 5] == C_RIGID
    assert board[5 + 11 * 5] == C_AGENT0
    # Far corner agent is fogged; close cells visible.
    assert board[10 + 11 * 10] == C_FOG


def test_observe_ego_centering_and_oob():
    cs = _cs_with_agents()
    obs = jax.jit(observe_ego)(cs, 1)  # at (0,0)
    w = 9
    board = np.asarray(obs.board).reshape(w, w)
    # Center is self.
    assert board[4, 4] == C_AGENT0 + 1
    # Off-board area reads RIGID.
    assert (board[:4, :] == C_RIGID).all() or (board[0, :] == C_RIGID).all()
    assert board[0, 0] == C_RIGID


def test_observation_hides_other_agents_stats():
    cs = _cs_with_agents()
    cs = cs._replace(agent_strength=cs.agent_strength.at[2].set(7))
    obs = observe(cs, 0)
    # Own stats only; agent 2's buffed strength is not in the observation.
    assert int(obs.strength) == int(cs.agent_strength[0])
    assert obs.alive.shape == (4,)


def _env(cs):
    return EnvState(
        game=cs,
        done=jnp.zeros((), bool),
        winner=jnp.full((), -1, jnp.int32),
        is_draw=jnp.zeros((), bool),
        key=jax.random.PRNGKey(0),
    )


def test_team_win_detection():
    from pomcpp_tpu.core.state import kill_many

    cs = _cs_with_agents()
    cs = kill_many(cs, 1, 3)  # team 1 (agents 1,3) wiped out
    es = env_step(_env(cs), jnp.zeros(4, jnp.int32), team_mode=True)
    assert bool(es.done)
    assert int(es.winner) == 0  # team id
    assert not bool(es.is_draw)


def test_team_not_done_with_one_per_team():
    from pomcpp_tpu.core.state import kill_many

    cs = _cs_with_agents()
    cs = kill_many(cs, 2, 3)  # one of each team remains (0 and 1)
    es = env_step(_env(cs), jnp.zeros(4, jnp.int32), team_mode=True)
    assert not bool(es.done)
    # FFA would also not be done (2 alive), but team mode continues by rule.


def test_team_draw():
    from pomcpp_tpu.core.state import kill_many

    cs = _cs_with_agents()
    cs = kill_many(cs, 0, 1, 2, 3)
    es = env_step(_env(cs), jnp.zeros(4, jnp.int32), team_mode=True)
    assert bool(es.done)
    assert bool(es.is_draw)
