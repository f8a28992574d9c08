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


def test_fogged_policy_is_blind_beyond_radius():
    """BEHAVIORAL fog proof (VERDICT r3 item 5): the full policy pathway
    (observe_ego -> features -> net -> move sampling) is bit-invariant to
    ANY change outside the view radius, while a full-view (range-10) policy
    does react -- i.e. the fogged net provably cannot condition play on
    hidden state, not just that the mask unit-works."""
    from pomcpp_tpu.learner import PPOConfig, ppo_init
    from pomcpp_tpu.learner.ppo import _policy_slots

    base = _cs_with_agents()
    # Two worlds differing only >radius-4 from agent 0 at (5,5): a bomb
    # with live timer + a wood wall in the far corner region.
    far = put_item(base, 10, 0, C_WOOD)
    far = far._replace(
        bomb_timer=far.bomb_timer.at[0 + 11 * 10].set(5),
        bomb_strength=far.bomb_strength.at[0 + 11 * 10].set(3),
    )

    cfg4 = PPOConfig(view_range=4)
    ts4 = ppo_init(jax.random.PRNGKey(3), cfg4)
    key = jax.random.PRNGKey(17)
    act = jax.jit(lambda p, g: _policy_slots(p, g, key, (0,), 4))
    mv_a, logp_a, val_a, feats_a = act(ts4.params, base)
    mv_b, logp_b, val_b, feats_b = act(ts4.params, far)
    assert np.array_equal(np.asarray(feats_a), np.asarray(feats_b))
    assert int(mv_a[0]) == int(mv_b[0])
    assert float(logp_a[0]) == float(logp_b[0])
    assert float(val_a[0]) == float(val_b[0])

    # Control arm: the same change IS visible at full observability --
    # the blindness above is the fog, not policy insensitivity.
    cfg10 = PPOConfig(view_range=10)
    ts10 = ppo_init(jax.random.PRNGKey(3), cfg10)
    act10 = jax.jit(lambda p, g: _policy_slots(p, g, key, (0,), 10))
    _, _, _, f10a = act10(ts10.params, base)
    _, _, _, f10b = act10(ts10.params, far)
    assert not np.array_equal(np.asarray(f10a), np.asarray(f10b))


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
