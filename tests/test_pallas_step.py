"""Fused Pallas step vs the XLA cellular engine (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.core.board_gen import init_state_np
from pomcpp_tpu.engine.cellular import CellState, cellular_step, from_state
from pomcpp_tpu.engine.pallas_step import pallas_step

_jcell = jax.jit(cellular_step)


def _batched(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def _diff_fields(a: CellState, b: CellState):
    bad = []
    for name in CellState._fields:
        if name == "timestep":
            continue
        if not np.array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        ):
            bad.append(name)
    return bad


@pytest.mark.parametrize("seed,kick", [(1, False), (2, True)])
def test_pallas_matches_cellular_trajectory(seed, kick):
    steps = 60
    rng = np.random.RandomState(seed)
    s = init_state_np(seed)
    if kick:
        s = s._replace(agent_can_kick=jnp.ones((4,), bool))
    cs = from_state(s)
    csb = _batched([cs, cs])  # batch of 2 identical boards

    for t in range(steps):
        mv = jnp.asarray(rng.randint(0, 6, size=(1, 4)), jnp.int32)
        mvb = jnp.concatenate([mv, mv], axis=0)
        ref = jax.vmap(_jcell)(csb, mvb)
        got = pallas_step(csb, mvb, interpret=True)
        bad = _diff_fields(ref, got)
        assert not bad, f"seed {seed} step {t}: fields differ: {bad}"
        csb = ref
        if int(np.asarray(csb.alive_count)[0]) <= 1:
            break
