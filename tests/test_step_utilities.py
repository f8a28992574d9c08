"""Unit tests for step-internal utilities.

Ports unit_test/bboard/step_utility_test.cpp:38-173.
"""

import jax.numpy as jnp

from pomcpp_tpu.engine import util
from helpers import (
    M_DOWN,
    M_IDLE,
    M_LEFT,
    M_RIGHT,
    M_UP,
    empty_state,
    kill_many,
    moves,
    put_agent,
)


def require_roots(roots, *expected):
    r = [int(v) for v in roots]
    for e in expected:
        assert e in r, f"root {e} not in {r}"


def test_destination_position_filling():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i, 0, i)
    m = moves(M_DOWN, M_LEFT, M_RIGHT, M_UP)
    dx, dy = util.fill_dest_pos(s, m)
    assert (int(dx[0]), int(dy[0])) == (0, 1)
    assert (int(dx[1]), int(dy[1])) == (0, 0)
    assert (int(dx[2]), int(dy[2])) == (3, 0)
    assert (int(dx[3]), int(dy[3])) == (3, -1)


def test_fix_switch_position():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i, 0, i)
    m = moves(M_RIGHT, M_RIGHT, M_LEFT, M_LEFT)
    dx, dy = util.fill_dest_pos(s, m)
    dx, dy = util.fix_switch_move(s, dx, dy)
    assert (int(dx[0]), int(dy[0])) == (1, 0)
    assert (int(dx[1]), int(dy[1])) == (int(s.agent_x[1]), int(s.agent_y[1]))
    assert (int(dx[2]), int(dy[2])) == (int(s.agent_x[2]), int(s.agent_y[2]))
    assert (int(dx[3]), int(dy[3])) == (2, 0)


def _deps(s, m):
    dx, dy = util.fill_dest_pos(s, m)
    return util.resolve_dependencies(s, dx, dy)


def test_resolve_0_1_dependency():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 1, 0, 1)
    s = put_agent(s, 8, 4, 2)
    s = put_agent(s, 9, 8, 3)
    _, roots, _ = _deps(s, moves(M_RIGHT, M_RIGHT, M_RIGHT, M_IDLE))
    require_roots(roots, 1)


def test_resolve_two_pairs():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 1, 0, 1)
    s = put_agent(s, 8, 8, 2)
    s = put_agent(s, 9, 8, 3)
    _, roots, _ = _deps(s, moves(M_RIGHT, M_RIGHT, M_RIGHT, M_IDLE))
    require_roots(roots, 1, 3)


def test_resolve_complete_chain():
    s = empty_state()
    for i in range(4):
        s = put_agent(s, i, 0, i)
    _, roots, _ = _deps(s, moves(M_RIGHT, M_RIGHT, M_RIGHT, M_RIGHT))
    require_roots(roots, 3)


def test_resolve_ouroboros():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 1, 0, 1)
    s = put_agent(s, 1, 1, 2)
    s = put_agent(s, 0, 1, 3)
    _, roots, root_count = _deps(s, moves(M_RIGHT, M_DOWN, M_LEFT, M_UP))
    assert int(roots[0]) == -1
    assert int(root_count) == 0


def test_dead_agents_as_roots():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 1, 0, 1)
    s = put_agent(s, 1, 1, 2)
    s = put_agent(s, 0, 1, 3)
    s = kill_many(s, 1)
    _, roots, _ = _deps(s, moves(M_RIGHT, M_DOWN, M_LEFT, M_UP))
    require_roots(roots, 0, 1)


def test_dependency_printers():
    """C22 (PrintDependency/PrintDependencyChain, step_utility.cpp:339-371)."""
    from pomcpp_tpu.render import render_dependency, render_dependency_chain

    dep = [-1, 0, 1, -1]
    assert render_dependency(dep).splitlines() == [
        "[0 <- ]",
        "[1 <- 0]",
        "[2 <- 1]",
        "[3 <- ]",
    ]
    # Roots 3 and 2: chain 2 walks 2 <- 1 <- 0 via the dependency array.
    chain = [3, 2, -1, -1, -1]
    assert render_dependency_chain(dep, chain).splitlines() == [
        "3",
        "2 <- 1 <- 0",
    ]
