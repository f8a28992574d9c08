#!/usr/bin/env python
"""Replay one census batch and dump field-level diffs for divergent steps
(debug aid for scripts/divergence_census.py findings)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-index", type=int, default=1)
    p.add_argument("--batch", type=int, default=500)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--boards", type=str, default="",
                   help="comma-separated board indices to report (default all)")
    p.add_argument("--policy", choices=["random", "simple"], default="random")
    args = p.parse_args()
    want = set(int(b) for b in args.boards.split(",") if b != "")

    from pomcpp_tpu.agents.simple_cellular import (
        simple_agent_cell_joint,
        simple_agent_init_batch,
    )
    from pomcpp_tpu.core.board_gen import init_state_np
    from pomcpp_tpu.engine.cellular import CellState, cellular_step, from_state
    from pomcpp_tpu.engine.step import step
    from pomcpp_tpu.testing.divergence import divergence_classes

    cmp_fields = [f for f in CellState._fields if f != "timestep"]
    simple = args.policy == "simple"

    @jax.jit
    def census_step(s, c, key, ps):
        if simple:
            keys = jax.random.split(key, s.agent_x.shape[0])
            mv, ps = jax.vmap(simple_agent_cell_joint)(keys, c, ps)
            mv = jnp.where(c.agent_dead, 0, mv).astype(jnp.int32)
        else:
            mv = jax.random.randint(key, s.agent_x.shape[:1] + (4,), 0, 6,
                                    dtype=jnp.int32)
        s2 = jax.vmap(step)(s, mv)
        e2 = jax.vmap(from_state)(s2)
        c2 = jax.vmap(cellular_step)(c, mv)
        eq = jnp.ones(mv.shape[0], bool)
        for f in cmp_fields:
            a, b = getattr(e2, f), getattr(c2, f)
            d = (a != b).reshape(mv.shape[0], -1).any(axis=1) \
                if a.ndim > 1 else (a != b)
            eq = eq & ~d
        c_next = jax.tree.map(
            lambda ce, ee: jnp.where(
                eq.reshape((-1,) + (1,) * (ce.ndim - 1)), ce, ee
            ),
            c2, e2,
        )
        live = s.alive_count > 1
        return s2, c_next, c2, eq, live, mv, ps

    bi = args.batch_index
    b = args.batch
    seeds = [args.seed + bi * args.batch + g for g in range(b)]
    states = [init_state_np(s) for s in seeds]
    s = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    kick = jnp.asarray([(g % 2) == 1 for g in range(b)])
    s = s._replace(agent_can_kick=jnp.broadcast_to(kick[:, None], (b, 4)))
    c = jax.vmap(from_state)(s)
    ps = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape),
        simple_agent_init_batch(),
    )
    key = jax.random.PRNGKey(args.seed * 7919 + bi)

    for t in range(args.steps):
        key, k = jax.random.split(key)
        s_pre = s
        s, c, c2, eq, live, mv, ps = census_step(s, c, k, ps)
        neq = np.asarray(~eq & live)
        if neq.any():
            idx = np.nonzero(neq)[0]
            pre_cell = jax.vmap(from_state)(s_pre)
            post_cell = jax.vmap(from_state)(s)
            for i in idx:
                if want and int(i) not in want:
                    continue
                one_pre = jax.tree.map(lambda x: x[i], pre_cell)
                one_post = jax.tree.map(lambda x: x[i], post_cell)
                one_c2 = jax.tree.map(lambda x: x[i], c2)
                one_pre_exact = jax.tree.map(lambda x: x[i], s_pre)
                cl = divergence_classes(one_pre, np.asarray(mv)[i], one_post,
                                        pre_exact=one_pre_exact)
                print(f"t={t} board={int(i)} mv={np.asarray(mv)[i].tolist()} "
                      f"classes={cl}")
                for f in cmp_fields:
                    av = np.asarray(getattr(one_post, f))
                    bv = np.asarray(getattr(one_c2, f))
                    if not np.array_equal(av, bv):
                        w = np.nonzero(np.atleast_1d(av != bv))[0][:8]
                        print(f"  {f}@{w.tolist()}: exact={np.atleast_1d(av)[w]}"
                              f" cell={np.atleast_1d(bv)[w]}")
        if not bool(np.asarray(live).any()):
            break


if __name__ == "__main__":
    main()
