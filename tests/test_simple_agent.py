"""SimpleAgent FSM: unit behavior + full-game parity vs the C++ reference.

The parity test reproduces the oracle's reproducible SimpleAgent games
(tools/oracle_dump.cpp "simple" mode): both sides seed per-agent
mt19937_64(seed*7919+i) streams through uniform_int_distribution(0,4); our
FSM reports whether a draw was consumed, so the host stream advances in
lockstep with the C++ agent's.  Moves AND the full post-step state are
diffed every step.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.agents.simple import (
    SimpleAgentState,
    simple_agent_act,
    simple_agent_init,
)
from pomcpp_tpu.core.board_gen import init_state_np
from pomcpp_tpu.core.rng import MT19937_64, UniformIntDistribution
from pomcpp_tpu.core.state import empty_state, plant_bomb, put_agent, put_item
from pomcpp_tpu.core.constants import C_WOOD, M_BOMB, M_IDLE
from pomcpp_tpu.engine.step import step
from pomcpp_tpu.testing import oracle as orc


def _act(state, agent_id, ast, rand):
    return jax.jit(simple_agent_act)(
        state, jnp.asarray(agent_id), ast, jnp.asarray(rand, jnp.int32)
    )


def test_bombs_adjacent_enemy():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = put_agent(s, 5, 6, 1)
    mv, consumed, _ = _act(s, 0, simple_agent_init(), 0)
    assert int(mv) == M_BOMB
    assert not bool(consumed)


def test_bombs_adjacent_wood():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = put_item(s, 6, 5, C_WOOD)
    mv, consumed, _ = _act(s, 0, simple_agent_init(), 0)
    assert int(mv) == M_BOMB
    assert not bool(consumed)


def test_flees_own_bomb():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = plant_bomb(s, 5, 5, 0, set_item=False, life=9)
    mv, _, _ = _act(s, 0, simple_agent_init(), 0)
    # Agent is in danger and must move off the bomb cross or pick a safe step;
    # IDLE would stay in blast range but the safe-place scan quirk can yield
    # it -- just require a decision was made deterministically.
    assert 0 <= int(mv) <= 5


def test_no_bomb_when_at_capacity():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 0, 1, 1)
    # Already carrying max bombs: cannot bomb even with adjacent enemy.
    s = s._replace(agent_bomb_count=s.agent_bomb_count.at[0].set(1))
    # Not in danger (bomb count simulated without bomb on board).
    mv, _, _ = _act(s, 0, simple_agent_init(), 0)
    assert int(mv) != M_BOMB


def run_simple_game_parity(seed, steps):
    """Full-game SimpleAgent parity vs the oracle's "simple" mode: moves
    AND post-step state diffed every step (shared with tests/test_soak.py,
    which runs it at game length over many seeds)."""
    out = orc_run = __import__("subprocess").run(
        [orc.ORACLE_BIN, "simple", hex(seed), str(steps)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    import json

    lines = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    state_dumps = [l for l in lines if "board" in l]
    move_dumps = [l["moves"] for l in lines if "moves" in l]

    s = init_state_np(seed)
    asts = [simple_agent_init() for _ in range(4)]
    rngs = [MT19937_64((seed * 7919 + i) & ((1 << 64) - 1)) for i in range(4)]
    dist = UniformIntDistribution(0, 4)
    jact = jax.jit(simple_agent_act)
    jstep = jax.jit(step)

    d = orc.diff_dumps(state_dumps[0], orc.state_to_dump(s))
    assert not d, f"seed {seed} initial: " + "; ".join(d)

    for t, ref_moves in enumerate(move_dumps):
        moves = []
        for i in range(4):
            if bool(np.asarray(s.agent_dead)[i]):
                moves.append(0)
                continue
            peek = copy.deepcopy(rngs[i])
            rand = dist(peek)
            mv, consumed, ast2 = jact(
                s, jnp.asarray(i), asts[i], jnp.asarray(rand, jnp.int32)
            )
            if bool(consumed):
                rngs[i] = peek
            asts[i] = ast2
            moves.append(int(mv))
        assert moves == ref_moves, (
            f"seed {seed} step {t}: moves {moves} != ref {ref_moves}"
        )
        s = jstep(s, jnp.asarray(moves, jnp.int32))
        d = orc.diff_dumps(state_dumps[t + 1], orc.state_to_dump(s))
        assert not d, f"seed {seed} step {t} state: " + "; ".join(d[:8])
    return len(move_dumps)


@pytest.mark.skipif(
    orc.ensure_oracle() is None, reason="reference oracle not buildable"
)
@pytest.mark.parametrize("seed", [0x1337, 0x13327, 1, 2, 3, 4, 5])
def test_simple_agent_game_parity(seed):
    run_simple_game_parity(seed, steps=80)
