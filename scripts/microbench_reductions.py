"""Microbenchmark cross-lane reductions and scalar round trips inside a
Pallas kernel loop -- the round-4 cost model for the step+cascade audit.

The r3 FSM rewrite established that reductions and while_loop rounds carry
a large fixed cost; this pins numbers on the specific shapes the step
kernel pays per env step so the audit can rank its levers:

  baseline    : 8 fused elementwise ops (reference point)
  any_plane   : jnp.any over a [128,128] bool plane -> scalar
  any4        : jnp.any over a [128,4] array -> scalar
  axis1_any   : jnp.any(axis=1) on [128,4] -> [128,1] (the ouroboros op)
  rot4_all    : the rot4-AND alternative to axis1_any (no reduction)
  packed_sum  : weighted one-hot sum-reduction ([128,128] -> [128,1])
  or_reduce   : bitwise-or lane reduction of an i32 flag plane -> [128,1]
  cond_false  : lax.cond, predicate false, cheap branch skipped
  cond_true   : lax.cond, predicate true, cheap branch taken
  while_2it   : while_loop doing 2 iterations of one cheap op
  prefix_or   : 7-round doubling prefix-or along lanes (scand candidate)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

BLOCK = 128
LANES = 128
K = 300


def _lane_iota(block):
    return jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 1)


def make_kernel(pattern):
    def kern(p_ref, a_ref, op_ref, oa_ref):
        plane = p_ref[:]
        ag = a_ref[:]
        lane = _lane_iota(BLOCK)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 4), 1)

        def body(i, carry):
            plane, ag = carry
            if pattern == "baseline":
                for _ in range(8):
                    plane = jnp.where(plane > 3, plane - 3, plane + 1) ^ i
            elif pattern == "any_plane":
                hit = jnp.any((plane & 7) == 7)
                plane = plane + jnp.where(hit, 1, 2)
            elif pattern == "any4":
                hit = jnp.any((ag & 7) == 7)
                ag = ag + jnp.where(hit, 1, 2)
            elif pattern == "axis1_any":
                m = jnp.any((ag & 7) == 7, axis=1, keepdims=True)
                ag = ag + jnp.where(m, 1, 2)
            elif pattern == "rot4_all":
                t = (ag & 7) != 7  # all-lanes AND via 3 rotations
                r1 = jnp.concatenate([t[:, 1:].astype(jnp.int32),
                                      t[:, :1].astype(jnp.int32)], 1)
                r2 = jnp.concatenate([t[:, 2:].astype(jnp.int32),
                                      t[:, :2].astype(jnp.int32)], 1)
                r3 = jnp.concatenate([t[:, 3:].astype(jnp.int32),
                                      t[:, :3].astype(jnp.int32)], 1)
                allm = t.astype(jnp.int32) & r1 & r2 & r3
                ag = ag + jnp.where(allm != 0, 1, 2)
            elif pattern == "packed_sum":
                w = jnp.zeros((BLOCK, LANES), jnp.int32)
                for j in range(4):
                    w = w + ((lane == (ag[:, j : j + 1] & 127)).astype(jnp.int32)
                             << (5 * j))
                red = jnp.sum((plane & 15) * w, axis=1, keepdims=True)
                ag = ag + ((red >> (5 * lane4)) & 31)
            elif pattern == "min_red4":
                # four per-agent masked min-reductions (the r3 scand shape)
                for j in range(4):
                    m = (plane & (1 << j)) != 0
                    v = jnp.min(jnp.where(m, lane, 999), axis=1,
                                keepdims=True)
                    ag = ag + (v & (1 << j))
            elif pattern in ("cond_false", "cond_true"):
                pred = (i < 0) if pattern == "cond_false" else (i >= 0)
                plane = jax.lax.cond(
                    pred, lambda p: p + 1, lambda p: p, plane
                )
            elif pattern == "while_2it":
                def wcond(c):
                    return c[1] < 2

                def wbody(c):
                    return c[0] + 1, c[1] + 1

                plane, _ = jax.lax.while_loop(
                    wcond, wbody, (plane, jnp.zeros((), jnp.int32))
                )
            elif pattern == "prefix_or":
                # exclusive prefix-or along lanes: 7 doubling rounds
                p = plane
                for sh in (1, 2, 4, 8, 16, 32, 64):
                    r = pltpu.roll(p, sh, 1)
                    p = p | jnp.where(lane >= sh, r, 0)
                plane = plane ^ p
            return plane, ag

        plane, ag = jax.lax.fori_loop(0, K, body, (plane, ag))
        op_ref[:] = plane
        oa_ref[:] = ag

    return kern


def bench(pattern, grid_b=128):
    f = pl.pallas_call(
        make_kernel(pattern),
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BLOCK * grid_b, LANES), jnp.int32),
            jax.ShapeDtypeStruct((BLOCK * grid_b, 4), jnp.int32),
        ],
    )
    p = jnp.ones((BLOCK * grid_b, LANES), jnp.int32)
    a = jnp.ones((BLOCK * grid_b, 4), jnp.int32) * 2
    fj = jax.jit(lambda p, a: [o.sum() for o in f(p, a)])
    [float(v) for v in fj(p, a)]
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        [float(v) for v in fj(p, a)]
    dt = (time.perf_counter() - t0) / reps
    per_iter = dt / (K * grid_b) * 1e9
    print(f"{pattern:12s}: {dt * 1e3:8.2f} ms   {per_iter:8.1f} ns/iter/block",
          flush=True)
    return dt


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}", flush=True)
    import sys

    pats = ["baseline", "any_plane", "any4", "axis1_any", "rot4_all",
            "packed_sum", "min_red4", "cond_false", "cond_true",
            "while_2it", "prefix_or"]
    if len(sys.argv) > 1:
        pats = sys.argv[1:]
    for p in pats:
        bench(p)
