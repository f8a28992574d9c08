"""Bit-level parity vs the compiled C++ reference (the oracle).

These tests build the unmodified reference engine out-of-tree
(tools/build_oracle.sh) and diff full fixed-seed trajectories — board raw
ints, agent stats, bomb/flame queues — against the JAX engine, step by step.
This is the conformance bar the reference itself never had (SURVEY.md §4).
"""

import jax
import numpy as np
import pytest

from pomcpp_tpu.core.board_gen import init_board_items_raw, init_state_np
from pomcpp_tpu.engine.step import step
from pomcpp_tpu.testing import oracle as orc

pytestmark = pytest.mark.skipif(
    orc.ensure_oracle() is None, reason="reference oracle not buildable"
)

BOARD_SEEDS = [0x1337, 0x13327] + list(range(200))
TRAJ_SEEDS = [0x1337, 0x13327, 0, 1, 2, 3, 4, 5, 6, 7]


@pytest.mark.parametrize("seed", BOARD_SEEDS)
def test_board_parity(seed):
    assert np.array_equal(orc.oracle_board(seed), init_board_items_raw(seed))


def _run_parity(seed: int, steps: int, kick: bool):
    rng = np.random.RandomState(seed ^ 0xABCDEF)
    moves = rng.randint(0, 6, size=(steps, 4))
    dumps = orc.oracle_traj(seed, moves, kick=kick)

    s = init_state_np(seed)
    if kick:
        s = s._replace(agent_can_kick=jax.numpy.ones((4,), bool))
    jstep = jax.jit(step)

    d = orc.diff_dumps(dumps[0], orc.state_to_dump(s))
    assert not d, f"seed {seed} initial state: " + "; ".join(d)
    for t in range(1, len(dumps)):
        s = jstep(s, moves[t - 1])
        d = orc.diff_dumps(dumps[t], orc.state_to_dump(s))
        assert not d, f"seed {seed} step {t} (kick={kick}): " + "; ".join(d[:8])


@pytest.mark.parametrize("seed", TRAJ_SEEDS)
def test_trajectory_parity(seed):
    _run_parity(seed, steps=120, kick=False)


@pytest.mark.parametrize("seed", TRAJ_SEEDS)
def test_trajectory_parity_kick(seed):
    _run_parity(seed, steps=120, kick=True)
