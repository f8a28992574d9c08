#!/usr/bin/env python
"""Vector-op census of the fused kernels (VERDICT r4 item 8 evidence).

Traces one step of the chunk kernel body (``_step_block``, plus
``fsm_block`` for the simple config) and counts jaxpr equations by
primitive, recursing into while/cond/scan sub-jaxprs (inner bodies are
counted ONCE -- the dynamic trip counts come from the attribution data,
not this census).  Together with the measured per-op issue floor
(scripts/microbench_sublane.py) this turns "fast" into a headroom ratio:

    floor(step) ~= N_ops x 20 ns  vs  measured block-step wall time.

Run on CPU (trace only): python scripts/op_census.py
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

BLOCK, LANES = 128, 128
I32 = jnp.int32

# Primitives that lower to (at least one) VPU vector op on a [*,128] tile.
_NONVECTOR = {
    "convert_element_type", "reshape", "squeeze", "broadcast_in_dim",
    "transpose", "slice", "concatenate", "iota",
}


def census(jaxpr, counts, depth=0):
    for eqn in jaxpr.eqns:
        counts[eqn.primitive.name] += 1
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                census(v.jaxpr, counts, depth + 1)
            elif isinstance(v, (list, tuple)):
                for w in v:
                    if isinstance(w, jax.extend.core.ClosedJaxpr):
                        census(w.jaxpr, counts, depth + 1)


def report(name, fn, args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = collections.Counter()
    census(jaxpr.jaxpr, counts)
    total = sum(counts.values())
    vector = sum(n for p, n in counts.items() if p not in _NONVECTOR
                 and p not in ("while", "cond", "scan", "pjit"))
    print(f"\n=== {name} ===")
    print(f"total eqns (inner bodies once): {total}   "
          f"vector-ish: {vector}")
    for p, n in counts.most_common(18):
        print(f"  {p:28s} {n}")
    return vector


def main() -> None:
    from pomcpp_tpu.engine.pallas_step import _step_block
    from pomcpp_tpu.engine.pallas_fsm import fsm_block

    zp = jnp.zeros((BLOCK, LANES), I32)
    za = jnp.zeros((BLOCK, 4), I32)

    n_step = report(
        "_step_block (one engine step, all phases traced)",
        lambda *a: _step_block(*a),
        (zp, zp, zp, zp, za, za, za, za + 1, za + 1, za, za, za),
    )
    n_fsm = report(
        "fsm_block (SimpleAgent decision, incl. BFS/danger/sort)",
        lambda board, bt, bs, ac, abc, amb, adead, rand, *fsm: fsm_block(
            board, bt, bs, ac, abc, amb, adead, rand,
            list(fsm[0:4]), fsm[4], fsm[5], list(fsm[6:10])
        ),
        (zp, zp, zp, za, za, za + 1, za, za) + tuple(za for _ in range(10)),
    )
    print(f"\nsummary: step={n_step} vector eqns, fsm={n_fsm} "
          f"(static counts; dynamic loop rounds multiply the inner bodies)")


if __name__ == "__main__":
    main()
