"""Environment orchestration tests (reference environment.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.agents import harmless_agent, lazy_agent, random_agent
from pomcpp_tpu.core.constants import C_AGENT0, C_PASSAGE, C_RIGID, C_WOOD
from pomcpp_tpu.core.state import empty_state, kill, put_agent
from pomcpp_tpu.env import (
    EnvState,
    env_reset,
    env_reset_np,
    env_step,
    env_step_auto_reset,
    rollout,
)
from pomcpp_tpu.env.environment import act_all
from pomcpp_tpu.render import render_state


def _env_from(game):
    return EnvState(
        game=game,
        done=jnp.zeros((), bool),
        winner=jnp.full((), -1, jnp.int32),
        is_draw=jnp.zeros((), bool),
        key=jax.random.PRNGKey(0),
    )


def test_reset_np_matches_reference_layout():
    es = env_reset_np(0x1337)
    board = np.asarray(es.game.board)
    # Agents in corners 0..3 (bboard.cpp:322-333).
    assert board[0] == C_AGENT0
    assert board[10] == C_AGENT0 + 1
    assert board[120] == C_AGENT0 + 2
    assert board[110] == C_AGENT0 + 3
    assert not bool(es.done)


def test_winner_detection():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i * 2, 0, i)
    for i in range(3):
        s = kill(s, i)
    es = _env_from(s)
    es = env_step(es, jnp.zeros(4, jnp.int32))
    assert bool(es.done)
    assert int(es.winner) == 3
    assert not bool(es.is_draw)


def test_draw_detection():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i * 2, 0, i)
        s = kill(s, i)
    es = _env_from(s)
    es = env_step(es, jnp.zeros(4, jnp.int32))
    assert bool(es.done)
    assert bool(es.is_draw)
    assert int(es.winner) == -1


def test_done_freezes_state():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i * 2, i * 2, i)
    for i in range(3):
        s = kill(s, i)
    es = env_step(_env_from(s), jnp.zeros(4, jnp.int32))
    assert bool(es.done)
    before = jax.tree.map(np.asarray, es)
    after = env_step(es, jnp.asarray([1, 1, 1, 1], jnp.int32))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        assert np.array_equal(a, np.asarray(b))


def test_auto_reset_restarts():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i * 2, i * 2, i)
    for i in range(3):
        s = kill(s, i)
    es = env_step(_env_from(s), jnp.zeros(4, jnp.int32))
    assert bool(es.done)
    es2 = env_step_auto_reset(es, jnp.zeros(4, jnp.int32))
    assert not bool(es2.done)
    assert int(es2.game.alive_count) == 4
    assert int(es2.game.timestep) == 0


def test_on_device_reset_board_distribution():
    es = jax.vmap(env_reset)(jax.random.split(jax.random.PRNGKey(7), 64))
    boards = np.asarray(es.game.board)
    frac_rigid = (boards == C_RIGID).mean()
    frac_wood = (boards == C_WOOD).mean()
    # 1/7 each, minus the 4 corner cells agents overwrite.
    assert 0.08 < frac_rigid < 0.20
    assert 0.08 < frac_wood < 0.20


def test_act_all_idles_dead_agents():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i * 2, 0, i)
    s = kill(s, 2)
    mv = act_all(random_agent, jax.random.PRNGKey(3), s)
    assert mv.shape == (4,)
    assert int(mv[2]) == 0


def test_rollout_scan_and_vmap():
    keys = jax.random.split(jax.random.PRNGKey(11), 8)
    es = jax.vmap(env_reset)(keys)

    run = jax.jit(jax.vmap(lambda e: rollout(e, random_agent, 50)))
    final, metrics = run(es)
    assert metrics["done"].shape == (8, 50)
    assert metrics["alive"].shape == (8, 50)
    # Alive counts never increase within an episode and stay in [0, 4].
    alive = np.asarray(metrics["alive"])
    assert alive.min() >= 0 and alive.max() <= 4
    # At least some games made progress (bombs kill with random agents).
    assert (alive < 4).any()


def test_rollout_harmless_never_ends():
    # Harmless agents never plant bombs; nobody can die.
    es = env_reset_np(0x1337)
    final, metrics = jax.jit(lambda e: rollout(e, harmless_agent, 80))(es)
    assert not np.asarray(metrics["done"]).any()
    assert int(final.game.alive_count) == 4
    assert int(final.game.timestep) == 80


def test_rollout_lazy_is_static():
    es = env_reset_np(0x1337)
    final, _ = jax.jit(lambda e: rollout(e, lazy_agent, 10))(es)
    np.testing.assert_array_equal(
        np.asarray(final.game.board), np.asarray(es.game.board)
    )


def test_render_smoke():
    es = env_reset_np(0x1337)
    out = render_state(es.game, color=False)
    assert " 0 " in out and " 2 " in out
    assert "agent 0" in out


def test_max_steps_cap_draws_out_stalemates():
    """max_steps>0 ends a still-contested game as a draw (official 800-step
    rule; opt-in — the reference has no cap and the default keeps that)."""
    import jax.numpy as jnp

    es = env_reset(jax.random.PRNGKey(0), engine="cellular")
    idle = jnp.zeros((4,), jnp.int32)
    step_cap = jax.jit(lambda e: env_step(e, idle, max_steps=9))
    step_ref = jax.jit(lambda e: env_step(e, idle))
    es_cap, es_ref = es, es
    for _ in range(11):
        es_cap = step_cap(es_cap)
        es_ref = step_ref(es_ref)
    assert bool(es_cap.done) and bool(es_cap.is_draw)
    assert int(es_cap.winner) == -1
    # Frozen after the draw: timestep stops advancing.
    assert int(es_cap.game.timestep) == 9
    # Reference semantics (no cap) untouched.
    assert not bool(es_ref.done) and int(es_ref.game.timestep) == 11


def test_randomized_positions_all_24_permutations():
    """env_reset(randomize_positions=True) permutes corner seats from the
    key (reference MakeGame's std::random_shuffle, environment.cpp:53-66):
    all 24 permutations occur, board plane and agent coords stay coherent,
    and the default stays fixed-corner (VERDICT r2 item 4)."""
    import jax.numpy as jnp

    from pomcpp_tpu.core.constants import BOARD_SIZE, C_AGENT0

    n = 512
    keys = jax.random.split(jax.random.PRNGKey(123), n)
    es = jax.jit(jax.vmap(
        lambda k: env_reset(k, engine="cellular", randomize_positions=True)
    ))(keys)

    ax = np.asarray(es.game.agent_x)
    ay = np.asarray(es.game.agent_y)
    board = np.asarray(es.game.board)
    last = BOARD_SIZE - 1
    corners = {(0, 0): 0, (last, 0): 1, (last, last): 2, (0, last): 3}

    perms = set()
    for b in range(n):
        seat = [None] * 4
        for a in range(4):
            c = corners[(int(ax[b, a]), int(ay[b, a]))]
            seat[c] = a
            # Board plane agrees with the coordinate arrays.
            cell = int(ax[b, a]) + BOARD_SIZE * int(ay[b, a])
            assert board[b, cell] == C_AGENT0 + a
        perms.add(tuple(seat))
    assert len(perms) == 24, f"only {len(perms)} of 24 permutations seen"

    # Default (and parity mode) remains fixed corners 0..3.
    es0 = jax.vmap(lambda k: env_reset(k, engine="cellular"))(keys[:8])
    assert np.array_equal(
        np.asarray(es0.game.agent_x) > 0,
        np.tile([False, True, True, False], (8, 1)),
    )
    assert np.array_equal(
        np.asarray(es0.game.agent_y) > 0,
        np.tile([False, False, True, True], (8, 1)),
    )


def test_randomized_positions_on_auto_reset():
    """Auto-reset with randomize_positions reseats agents: force done
    boards and check restarted games show a non-identity permutation
    somewhere in the batch."""
    import jax.numpy as jnp

    n = 64
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(keys)
    es = es._replace(done=jnp.ones((n,), bool))
    idle = jnp.zeros((n, 4), jnp.int32)

    from pomcpp_tpu.env.environment import env_step_auto_reset_batch

    es2 = jax.jit(
        lambda e, m: env_step_auto_reset_batch(
            e, m, randomize_positions=True
        )
    )(es, idle)
    ax = np.asarray(es2.game.agent_x)
    ay = np.asarray(es2.game.agent_y)
    # Fresh boards (timestep reset) ...
    assert (np.asarray(es2.game.timestep) == 0).all()
    # ... with at least one board whose agent 0 is NOT in corner 0.
    assert ((ax[:, 0] != 0) | (ay[:, 0] != 0)).any()
