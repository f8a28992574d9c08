"""Lookahead search (pomcpp_tpu/search.py): playout values steer away from
certain death."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.core.constants import M_UP
from pomcpp_tpu.core.state import empty_state, put_agent
from pomcpp_tpu.engine.cellular import from_state
from pomcpp_tpu.engine.flames import spawn_flame
from pomcpp_tpu.search import lookahead_moves


def test_lookahead_avoids_walking_into_flame():
    # Fresh flame cross at (0,0) (covers (0,1)); agent 0 sits at (0,2):
    # moving UP is immediate death; every playout from that child scores
    # ~0, so UP can never be argmax.
    s = empty_state()
    s = put_agent(s, 0, 2, 0)
    s = put_agent(s, 10, 10, 1)
    s = put_agent(s, 0, 10, 2)
    s = put_agent(s, 10, 0, 3)
    s = spawn_flame(s, 0, 0, 1)
    cs = from_state(s)
    csb = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), cs)

    moves, vals = lookahead_moves(
        csb, 0, jax.random.PRNGKey(0), depth=3, n_playouts=4
    )
    vals = np.asarray(vals)
    # The UP candidate's value is the death floor (died at t=0).
    assert (vals[:, M_UP] == 0.0).all(), vals
    assert (np.asarray(moves) != M_UP).all()
    # Some non-suicidal candidate scores strictly better.
    assert (vals.max(axis=1) > 0.5).all()
