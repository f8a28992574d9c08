#!/usr/bin/env python
"""Randomized-state exhaustive conformance fuzzer (round 5).

The fixed 3-agent sweep scenarios (tests/test_exhaustive_3agent.py) are
hand-built around chain reversions; real mid-game states also carry
flames, revealed powerups, kicked bombs in flight and heterogeneous agent
stats.  This fuzzer SNAPSHOTS random exact-engine trajectories mid-game,
injects each snapshot into the compiled reference (oracle ``loadenum3``),
sweeps ALL (n_moves^3)^2 two-step joint moves of three live agents, and
diffs every resulting state bit-for-bit against our exact engine.

Usage:
  python scripts/state_fuzz.py --states 20 [--steps-range 20,90]
      [--n-moves 5] [--seed 0]

Exit 0 = every sequence of every state matches.  Per-state cost ~1 min
(15625 sequences at n=5).  CPU only.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def fuzz_one(seed: int, snap_step: int, n_moves: int, verbose=print):
    """Snapshot a random trajectory at ``snap_step`` and sweep it.

    Returns the number of mismatching sequences (0 = pass); skips (returns
    None) if fewer than 3 agents are alive at the snapshot.
    """
    from pomcpp_tpu.core.board_gen import init_state_np
    from pomcpp_tpu.engine.step import step
    from pomcpp_tpu.testing import oracle as orc

    rng = np.random.RandomState(seed ^ 0x5EED)
    s = init_state_np(seed)
    if seed % 2 == 1:
        s = s._replace(agent_can_kick=jnp.ones((4,), bool))
    jstep = jax.jit(step)
    for _ in range(snap_step):
        s = jstep(s, jnp.asarray(rng.randint(0, 6, 4), jnp.int32))
        if int(s.alive_count) < 3:
            return None

    alive = [i for i in range(4) if not bool(np.asarray(s.agent_dead)[i])]
    if len(alive) < 3:
        return None
    a, b, c = alive[:3]

    base_dump, dumps = orc.enum3_trio(
        orc.state_to_dump(s), a, b, c, n_moves=n_moves
    )
    d = orc.diff_dumps(base_dump, orc.state_to_dump(s))
    assert not d, f"seed {seed}: state injection diverged: {d[:5]}"

    n3 = n_moves ** 3
    total = n3 * n3
    code = np.arange(total)
    c1, c2 = code % n3, code // n3
    mv = np.zeros((2, total, 4), np.int64)
    mv[0, :, a], mv[0, :, b], mv[0, :, c] = c1 % n_moves, \
        c1 // n_moves % n_moves, c1 // n_moves ** 2
    mv[1, :, a], mv[1, :, b], mv[1, :, c] = c2 % n_moves, \
        c2 // n_moves % n_moves, c2 // n_moves ** 2
    mv = jnp.asarray(mv, jnp.int32)

    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (total,) + x.shape), s
    )
    out = jax.jit(jax.vmap(lambda st, m1, m2: step(step(st, m1), m2)))(
        batched, mv[0], mv[1]
    )
    host = jax.tree.map(np.asarray, out)

    bad = 0
    for k in range(total):
        one = jax.tree.map(lambda x: x[k], host)
        diff = orc.diff_dumps(dumps[k], orc.state_to_dump(one))
        if diff:
            bad += 1
            if bad <= 3:
                verbose(f"  seed {seed} snap {snap_step} seq {k} "
                        f"(mv1={np.asarray(mv[0, k]).tolist()} "
                        f"mv2={np.asarray(mv[1, k]).tolist()}): {diff[:3]}")
    return bad


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--states", type=int, default=20)
    p.add_argument("--steps-range", type=str, default="20,90")
    p.add_argument("--n-moves", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    lo, hi = (int(x) for x in args.steps_range.split(","))

    from pomcpp_tpu.testing import oracle as orc

    assert orc.ensure_oracle() is not None, "reference oracle not buildable"

    rng = np.random.RandomState(args.seed)
    done = 0
    total_bad = 0
    attempt = 0
    while done < args.states:
        seed = args.seed * 100000 + attempt
        snap = int(rng.randint(lo, hi))
        attempt += 1
        bad = fuzz_one(seed, snap, args.n_moves)
        if bad is None:
            continue  # game too dead at the snapshot; next seed
        done += 1
        total_bad += bad
        print(f"state {done}/{args.states} (seed {seed}, snap {snap}): "
              f"{'OK' if bad == 0 else f'{bad} MISMATCHES'}", flush=True)
    print(f"fuzz complete: {done} states x {args.n_moves ** 6} sequences, "
          f"{total_bad} mismatches")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
