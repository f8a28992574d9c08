"""Microbenchmark: per-op cost of [block,4] agent arrays vs [block,128]
planes inside a Pallas TPU kernel.

Round-2 hypothesis: the movement phase's ~380 [block,4] agent-scalar ops
cost as much per op as full plane ops (a [128,4] i32 tile occupies the same
16 vregs as [128,128] at 3% lane utilization), so they dominate the kernel.
This measures it: K iterations of N chained ops on each shape.

Run on TPU:  python scripts/microbench_layout.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "build/jax_cache")

BLOCK = 128
K = 200   # outer loop iterations
N = 64    # chained ops per iteration


def _kernel(x_ref, o_ref, *, lanes):
    def body(i, x):
        # N dependent cheap vector ops (add/cmp/select mix like the kernel's).
        for _ in range(N // 4):
            m = x > 3
            x = jnp.where(m, x - 3, x + 1)
            x = x ^ 5
            x = x + i
        return x

    o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])


def bench(shape, grid_b=16384 // BLOCK):
    lanes = shape[1]
    f = pl.pallas_call(
        functools.partial(_kernel, lanes=lanes),
        grid=(grid_b,),
        in_specs=[pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((shape[0] * grid_b, lanes), jnp.int32),
    )
    x = jnp.ones((shape[0] * grid_b, lanes), jnp.int32)
    # Fetch a scalar to host each rep: axon's block_until_ready can return
    # early, so only a host fetch gives honest timing.
    fj = jax.jit(lambda x: f(x).sum())
    float(fj(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        float(fj(x))
    dt = (time.perf_counter() - t0) / reps
    ops = K * N
    print(
        f"shape {shape}: {dt * 1e3:8.2f} ms  "
        f"({dt / ops * 1e9:7.1f} ns/op/block, {ops} ops, {grid_b} blocks)"
    )
    return dt


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}")
    t_plane = bench((BLOCK, 128))
    t_agent = bench((BLOCK, 4))
    t_agent8 = bench((BLOCK, 8))
    t_a32 = bench((BLOCK, 32))
    print(f"[block,4] / [block,128] per-op cost ratio: {t_agent / t_plane:.2f}")
    print(f"[block,8] / [block,128]: {t_agent8 / t_plane:.2f}")
    print(f"[block,32] / [block,128]: {t_a32 / t_plane:.2f}")
