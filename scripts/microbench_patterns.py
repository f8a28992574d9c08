"""Microbenchmark the specific op patterns the fused step kernel uses,
to build a per-pattern cost model for the round-2 op diet.

Patterns measured (all on [128, x] i32 in one Pallas kernel, K reps):
  baseline  : chain of plain [128,128] elementwise ops
  colslice  : a[:, i] column extract + compare + masked write-back
  whole4    : whole-array [128,4] ops with concat-based lane roll
  onehot_rd : one-hot read from a [128,128] plane -> [128,1]
  push      : the _push neighbor-shift helper (iota + roll + mask)
  push_hoist: _push with the iota/x/y/ok masks precomputed once
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "build/jax_cache")

BLOCK = 128
LANES = 128
K = 300
BOARD_SIZE = 11
NUM_CELLS = 121


def _lane_iota(block):
    return jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 1)


def _push(plane, d, dist=1):
    block = plane.shape[0]
    lane = _lane_iota(block)
    x = lane % BOARD_SIZE
    y = lane // BOARD_SIZE
    if d == 1:
        ok = y + dist < BOARD_SIZE
        shift = -dist * BOARD_SIZE
    else:
        ok = x - dist >= 0
        shift = dist
    rolled = pltpu.roll(plane, shift % LANES, 1)
    ok = ok & (lane < NUM_CELLS)
    return jnp.where(ok, rolled, 0)


def make_kernel(pattern):
    def kern(p_ref, a_ref, op_ref, oa_ref):
        plane = p_ref[:]
        ag = a_ref[:]
        if pattern.startswith("push_hoist"):
            lane = _lane_iota(BLOCK)
            x = lane % BOARD_SIZE
            y = lane // BOARD_SIZE
            ok1 = ((y + 1 < BOARD_SIZE) & (lane < NUM_CELLS))
            ok3 = ((x - 1 >= 0) & (lane < NUM_CELLS))

        def body(i, carry):
            plane, ag = carry
            if pattern == "baseline":
                for _ in range(8):
                    plane = jnp.where(plane > 3, plane - 3, plane + 1) ^ i
            elif pattern == "colslice":
                for j in range(4):
                    c = ag[:, j]
                    m = c > 2
                    cmask = (
                        jax.lax.broadcasted_iota(jnp.int32, ag.shape, 1) == j
                    )
                    ag = jnp.where(
                        cmask, jnp.where(m, c - 2, c + 1)[:, None] ^ i, ag
                    )
            elif pattern == "whole4":
                r1 = jnp.concatenate([ag[:, 1:], ag[:, :1]], axis=1)
                m = ag == r1
                ag = jnp.where(m, ag + 1, ag - 1) ^ i
                r2 = jnp.concatenate([ag[:, 2:], ag[:, :2]], axis=1)
                ag = jnp.maximum(ag, r2) + i
            elif pattern == "onehot_rd":
                for j in range(4):
                    oh = _lane_iota(BLOCK) == ag[:, j : j + 1]
                    v = jnp.max(jnp.where(oh, plane, 0), axis=1, keepdims=True)
                    ag = jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, ag.shape, 1) == j,
                        v & 0xFF, ag,
                    )
            elif pattern == "push":
                plane = _push(plane, 1) + _push(plane, 3) + i
            elif pattern == "push_hoist":
                r1 = pltpu.roll(plane, (-BOARD_SIZE) % LANES, 1)
                r3 = pltpu.roll(plane, 1, 1)
                plane = (
                    jnp.where(ok1, r1, 0) + jnp.where(ok3, r3, 0) + i
                )
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
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    print(f"{pattern:12s}: {dt * 1e3:8.2f} ms   {per_iter:8.1f} ns/iter/block")
    return dt


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}")
    for p in ["baseline", "colslice", "whole4", "onehot_rd", "push", "push_hoist"]:
        bench(p)
