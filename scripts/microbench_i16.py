"""Measure i16 vs i32 plane-op cost on TPU (ROADMAP: 'i16 plane packing').

If a [128,128] i16 elementwise op costs ~half an i32 one (8 vregs vs 16),
narrowing the BFS/danger planes is a ~2x lever on the FSM kernel; if Mosaic
legalizes i16 to i32 internally, it is a dead end.  Also probes pltpu.roll
on i16 (the _push primitive) since that gates any narrow-plane BFS.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "build/jax_cache")

BLOCK = 128
LANES = 128
K = 300


def make_kernel(pattern):
    def kern(p_ref, op_ref):
        plane = p_ref[:]

        def body(i, plane):
            if pattern.endswith("chain"):
                for _ in range(8):
                    plane = (plane & 0x7E7E) | ((plane + 1) & 0x0101)
                    plane = plane ^ (plane >> 7)
            elif pattern.endswith("roll"):
                for _ in range(4):
                    plane = plane + pltpu.roll(plane, 1, 1)
                    plane = plane ^ pltpu.roll(plane, 117, 1)
            return plane

        plane = jax.lax.fori_loop(0, K, body, plane)
        op_ref[:] = plane

    return kern


def bench(pattern, dtype, grid_b=128):
    f = pl.pallas_call(
        make_kernel(pattern),
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BLOCK * grid_b, LANES), dtype),
        ],
    )
    p = jnp.ones((BLOCK * grid_b, LANES), dtype)
    fj = jax.jit(lambda p: [o.astype(jnp.int32).sum() for o in f(p)])
    try:
        [float(v) for v in fj(p)]
    except Exception as e:
        print(f"{pattern:12s} {dtype.__name__:6s}: FAILED "
              f"({type(e).__name__}: {str(e)[:120]})")
        return
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        [float(v) for v in fj(p)]
    dt = (time.perf_counter() - t0) / reps
    per_iter = dt / (K * grid_b) * 1e9
    print(f"{pattern:12s} {dtype.__name__:6s}: {dt * 1e3:8.2f} ms "
          f"{per_iter:8.1f} ns/iter/block", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].platform}")
    for pat in ["chain", "roll"]:
        for dt in [jnp.int32, jnp.int16, jnp.int8]:
            bench(pat, dt)
