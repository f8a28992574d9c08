"""Lookahead search (pomcpp_tpu/search.py): playout values steer away from
certain death."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.core.constants import M_UP
from pomcpp_tpu.core.state import empty_state, put_agent
from pomcpp_tpu.engine.cellular import from_state
from pomcpp_tpu.engine.flames import spawn_flame
from pomcpp_tpu.search import lookahead_moves, mcts_moves


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


def test_mcts_avoids_walking_into_flame():
    # Same scenario as above, through the UCT tree: the six root edges are
    # each tried once (unvisited-first), UP's playouts all score the death
    # floor, so visits concentrate elsewhere and the robust child is never
    # UP.
    s = empty_state()
    s = put_agent(s, 0, 2, 0)
    s = put_agent(s, 10, 10, 1)
    s = put_agent(s, 0, 10, 2)
    s = put_agent(s, 10, 0, 3)
    s = spawn_flame(s, 0, 0, 1)
    cs = from_state(s)
    csb = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), cs)

    moves, visits, root_q = mcts_moves(
        csb, 0, jax.random.PRNGKey(0), n_sim=18, depth=3, max_tree_depth=4
    )
    visits = np.asarray(visits)
    root_q = np.asarray(root_q)
    # Every simulation backprops exactly one root-edge visit.
    assert (visits.sum(axis=1) == 18).all(), visits
    # All six root edges were expanded (unvisited-first selection).
    assert (visits > 0).all(), visits
    # The suicidal edge keeps the death-floor value and loses the argmax.
    assert (root_q[:, M_UP] == 0.0).all(), root_q
    assert (np.asarray(moves) != M_UP).all()
    assert (visits[:, M_UP] < visits.max(axis=1)).all(), visits


def test_mcts_dead_agent_idles():
    s = empty_state()
    s = put_agent(s, 0, 2, 0)
    s = put_agent(s, 10, 10, 1)
    s = put_agent(s, 0, 10, 2)
    s = put_agent(s, 10, 0, 3)
    cs = from_state(s)
    cs = cs._replace(
        agent_dead=cs.agent_dead.at[0].set(True),
        alive_count=jnp.asarray(3, cs.alive_count.dtype),
    )
    csb = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), cs)
    moves, _, _ = mcts_moves(
        csb, 0, jax.random.PRNGKey(1), n_sim=6, depth=2, max_tree_depth=2
    )
    assert int(moves[0]) == 0


def test_mcts_pallas_avoids_walking_into_flame():
    # The pallas-backed batch-level MCTS (interpret mode on CPU): same
    # scenario, same behavioral assertions as the cellular-backend test.
    from pomcpp_tpu.search import mcts_moves_pallas

    s = empty_state()
    s = put_agent(s, 0, 2, 0)
    s = put_agent(s, 10, 10, 1)
    s = put_agent(s, 0, 10, 2)
    s = put_agent(s, 10, 0, 3)
    s = spawn_flame(s, 0, 0, 1)
    cs = from_state(s)
    csb = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), cs)

    moves, visits, root_q = mcts_moves_pallas(
        csb, 0, jax.random.PRNGKey(0), n_sim=18, depth=3,
        max_tree_depth=4, interpret=True,
    )
    visits = np.asarray(visits)
    root_q = np.asarray(root_q)
    assert (visits.sum(axis=1) == 18).all(), visits
    assert (visits > 0).all(), visits
    assert (root_q[:, M_UP] == 0.0).all(), root_q
    assert (np.asarray(moves) != M_UP).all()
    assert (visits[:, M_UP] < visits.max(axis=1)).all(), visits


def test_mcts_net_avoids_walking_into_flame():
    # PUCT with a FRESH (untrained) net still must not pick certain death:
    # the UP child's leaf evaluations are the exact terminal -1 (dead),
    # so its Q pins to -1 while any surviving edge scores higher.
    from pomcpp_tpu.learner.ppo import _MODEL, ppo_init
    from pomcpp_tpu.search import mcts_moves_net

    s = empty_state()
    s = put_agent(s, 0, 2, 0)
    s = put_agent(s, 10, 10, 1)
    s = put_agent(s, 0, 10, 2)
    s = put_agent(s, 10, 0, 3)
    s = spawn_flame(s, 0, 0, 1)
    cs = from_state(s)
    csb = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), cs)

    params = ppo_init(jax.random.PRNGKey(0)).params
    moves, visits, root_q = jax.jit(
        lambda b, k: mcts_moves_net(
            b, 0, k, _MODEL.apply, params, n_sim=18, max_tree_depth=4
        )
    )(csb, jax.random.PRNGKey(1))
    assert (np.asarray(moves) != M_UP).all()
    # Every simulation expanded a node and backed a value into the root.
    assert np.asarray(visits).sum(axis=1).tolist() == [18, 18]
    assert np.isfinite(np.asarray(root_q)).all()
