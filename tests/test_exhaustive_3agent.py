"""Exhaustive TWO-step conformance with THREE live interacting agents
(VERDICT r3 item 6).

The 2-step pairwise sweep (test_exhaustive_2step.py) prunes to two live
agents, so multi-link chain reversions that cascade through a SECOND
displaced agent across a step boundary (step_utility.cpp:62-128 -- agent
bounces off a blocked bomb into the cell another agent vacated, which
reverts that agent in turn) are only covered by fixed kick-zoo scenarios.
This sweep exhausts them: three agents in kick range of pre-planted bombs,
ALL 125 x 125 two-step joint assignments of the pruned 5-move alphabet
(IDLE + 4 directions; bomb planting adds no reversion structure the
pre-planted bombs don't already provide), each sequence diffed bit-for-bit
against the unmodified reference via the oracle's ``loadenum3`` mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.engine.step import step
from pomcpp_tpu.testing import oracle as orc

from helpers import (  # noqa: F401
    empty_state,
    kill_many,
    plant_bomb,
    put_agent,
)

pytestmark = pytest.mark.skipif(
    orc.ensure_oracle() is None, reason="reference oracle not buildable"
)

A, B, C = 0, 1, 2  # three live agents; agent 3 is dead in every scenario


def _base(kicks=(True, True, True)):
    s = kill_many(empty_state(), 3)
    kick = jnp.asarray([kicks[0], kicks[1], kicks[2], False])
    return s._replace(agent_can_kick=kick)


def _scenarios():
    out = {}

    # 1. Train: A-B-C packed in a row with C's own bomb one cell further.
    # All-right makes C step onto (or kick) the bomb; the phase-2
    # bounce-back then reverts C into B's vacated cell and B into A's --
    # the 3-link chain (step_utility.cpp:92-118) and its 2-step replays.
    s = _base(kicks=(False, False, False))
    s = put_agent(s, 2, 4, A)
    s = put_agent(s, 3, 4, B)
    s = put_agent(s, 4, 4, C)
    s = plant_bomb(s, 5, 4, C, set_item=True)
    out["train_no_kick"] = s

    # 2. Same train with kicks enabled: C kicks the bomb instead of
    # bouncing; the bomb slides, can be blocked, and the kicker chain
    # reversion (ResolveBombCollision path) runs through three agents.
    s = _base()
    s = put_agent(s, 2, 4, A)
    s = put_agent(s, 3, 4, B)
    s = put_agent(s, 4, 4, C)
    s = plant_bomb(s, 5, 4, C, set_item=True)
    s = plant_bomb(s, 8, 4, C, set_item=True)
    out["train_kick"] = s

    # 3. Cross: a central bomb with agents on three sides, each in kick
    # range; simultaneous kicks/walk-ins from different directions exercise
    # dest-collision + reversion ordering among all three.
    s = _base()
    s = plant_bomb(s, 5, 5, A, set_item=True)
    s = put_agent(s, 4, 5, A)
    s = put_agent(s, 6, 5, B)
    s = put_agent(s, 5, 4, C)
    out["cross"] = s

    return out


def _sweep_moves(n: int = 5):
    """moves[step t][code] -> i32[n^6, 4] matching the oracle's order."""
    n3 = n * n * n
    code = np.arange(n3 * n3)
    c1, c2 = code % n3, code // n3
    mv = np.zeros((2, n3 * n3, 4), np.int64)
    mv[0, :, A], mv[0, :, B], mv[0, :, C] = c1 % n, c1 // n % n, c1 // n**2
    mv[1, :, A], mv[1, :, B], mv[1, :, C] = c2 % n, c2 // n % n, c2 // n**2
    return jnp.asarray(mv, jnp.int32)


_JSTEP2 = jax.jit(jax.vmap(lambda s, m1, m2: step(step(s, m1), m2)))


def _run_sweep(name, s, n_moves):
    base_dump, dumps = orc.enum3_trio(
        orc.state_to_dump(s), A, B, C, n_moves=n_moves
    )

    d = orc.diff_dumps(base_dump, orc.state_to_dump(s))
    assert not d, "state injection diverged: " + "; ".join(d[:5])

    total = n_moves ** 6
    n3 = n_moves ** 3
    mv = _sweep_moves(n_moves)
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (total,) + x.shape), s
    )
    out = _JSTEP2(batched, mv[0], mv[1])
    host = jax.tree.map(np.asarray, out)

    bad = []
    for c in range(total):
        one = jax.tree.map(lambda x: x[c], host)
        diff = orc.diff_dumps(dumps[c], orc.state_to_dump(one))
        if diff:
            c1, c2 = c % n3, c // n3
            n = n_moves
            bad.append((
                (c1 % n, c1 // n % n, c1 // n**2),
                (c2 % n, c2 // n % n, c2 // n**2),
                diff[:3],
            ))
            if len(bad) >= 5:
                break
    assert not bad, (
        f"{name}: >= {len(bad)} of {total} three-agent sequences diverge; "
        f"first: {bad[:3]}"
    )


@pytest.mark.parametrize("name", list(_scenarios()))
def test_exhaustive_three_agent_parity(name):
    _run_sweep(name, _scenarios()[name], 5)


def test_exhaustive_three_agent_with_bombs():
    """Full 6-move alphabet (BOMB included) on the kick train: 6^3 x 6^3 =
    46656 sequences exhaust plant-interacting multi-agent chains (a plant
    under a reverting agent, plant + kick in one step, ...)."""
    _run_sweep("train_kick+bombs", _scenarios()["train_kick"], 6)
