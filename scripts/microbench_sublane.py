"""Microbenchmark: does per-op cost scale with SUBLANE rows inside a
Pallas TPU kernel?  ([Q,128] sub-tiles of a [128,128] block, Q in
{8,16,32,64,128}.)

Decides the r5 BFS repack question (VERDICT r4 item 1): the SWAR BFS
currently runs on [64,128] tiles (2 boards/i32, 12-bit fields).  A
vis-only / per-rank-plane layout would pack 8 boards/i32 and run rounds
on [16,128] tiles with MORE ops; it only wins if op cost scales ~linearly
with rows.  The r4 PALLAS_CHUNK_BLOCK=64 negative result hints a fixed
per-op cost may dominate instead — this measures it directly, for both
element-wise ops and lane rolls (the BFS push).

Run on TPU:  python scripts/microbench_sublane.py
"""

import functools
import time

import jax

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402
hold_tpu_client_lock()
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "build/jax_cache")

BLOCK = 128
GRID = 16384 // BLOCK
K = 200   # fori_loop iterations
N = 64    # chained ops per iteration


def _kernel_elem(x_ref, o_ref, *, rows):
    def body(i, sub):
        for _ in range(N // 4):
            m = sub > 3
            sub = jnp.where(m, sub - 3, sub + 1)
            sub = sub ^ 5
            sub = sub + i
        return sub

    o_ref[:rows] = jax.lax.fori_loop(0, K, body, x_ref[:rows])
    if rows < BLOCK:
        o_ref[rows:] = x_ref[rows:]


def _kernel_roll(x_ref, o_ref, *, rows):
    def body(i, sub):
        for _ in range(N // 2):
            sub = pltpu.roll(sub, 1, 1)
            sub = sub + i
        return sub

    o_ref[:rows] = jax.lax.fori_loop(0, K, body, x_ref[:rows])
    if rows < BLOCK:
        o_ref[rows:] = x_ref[rows:]


def bench(kern, rows, label):
    shape = (BLOCK, 128)
    f = pl.pallas_call(
        functools.partial(kern, rows=rows),
        grid=(GRID,),
        in_specs=[pl.BlockSpec(shape, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLOCK * GRID, 128), jnp.int32),
    )
    x = jnp.ones((BLOCK * GRID, 128), jnp.int32)
    fj = jax.jit(lambda x: f(x).sum())
    float(fj(x))  # compile + warm
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        float(fj(x))  # host fetch = the only honest barrier on axon
    dt = (time.perf_counter() - t0) / reps
    ops = K * N
    print(f"{label} rows={rows:3d}: {dt * 1e3:8.2f} ms  "
          f"({dt / ops / GRID * 1e9:7.2f} ns/op/block)")
    return dt


def bench_big(kern, block, label):
    """Same total work (16384 board-rows), bigger tiles, fewer grid blocks.
    Directly comparable WALL time: if ops are issue-bound (flat in rows),
    [256,128] x 64 blocks beats [128,128] x 128 blocks ~2x."""
    grid = 16384 // block
    shape = (block, 128)
    f = pl.pallas_call(
        functools.partial(kern, rows=block),
        grid=(grid,),
        in_specs=[pl.BlockSpec(shape, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(shape, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16384, 128), jnp.int32),
    )
    x = jnp.ones((16384, 128), jnp.int32)
    fj = jax.jit(lambda x: f(x).sum())
    float(fj(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        float(fj(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label} block={block:4d} grid={grid:3d}: {dt * 1e3:8.2f} ms "
          f"(same 16384 total rows)")
    return dt


def _kernel_dot(x_ref, w_ref, o_ref, *, rows):
    w = w_ref[:]

    def body(i, sub):
        for _ in range(N // 2):
            sub = jax.lax.dot(sub, w)
            sub = sub + 1.0
        return sub

    o_ref[:rows] = jax.lax.fori_loop(0, K, body, x_ref[:rows])
    if rows < BLOCK:
        o_ref[rows:] = x_ref[rows:]


def bench_dot(rows):
    """Chained [rows,128] @ [128,128] f32 dots (the shift-matrix BFS push
    candidate) vs pltpu.roll at the same shapes."""
    shape = (BLOCK, 128)
    f = pl.pallas_call(
        functools.partial(_kernel_dot, rows=rows),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(shape, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLOCK * GRID, 128), jnp.float32),
    )
    import numpy as np

    x = jnp.ones((BLOCK * GRID, 128), jnp.float32)
    w = jnp.asarray(np.eye(128, k=1), jnp.float32)  # shift matrix
    fj = jax.jit(lambda x: f(x, w).sum())
    float(fj(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        float(fj(x))
    dt = (time.perf_counter() - t0) / reps
    ops = K * (N // 2)
    print(f"dot  rows={rows:3d}: {dt * 1e3:8.2f} ms  "
          f"({dt / ops / GRID * 1e9:7.2f} ns/dot+add/block)")
    return dt


def _kernel_sumred(x_ref, o_ref, *, rows):
    def body(i, sub):
        for _ in range(N // 8):
            r = jnp.sum(sub, axis=1, keepdims=True)
            sub = sub + r
        return sub

    o_ref[:rows] = jax.lax.fori_loop(0, K, body, x_ref[:rows])
    if rows < BLOCK:
        o_ref[rows:] = x_ref[rows:]


def _kernel_dotred(x_ref, w_ref, o_ref, *, rows):
    w = w_ref[:, :8]  # [128, 8] ones columns

    def body(i, sub):
        for _ in range(N // 8):
            lo = jax.lax.dot((sub & 0xFFFF).astype(jnp.float32), w)
            hi = jax.lax.dot((sub >> 16).astype(jnp.float32), w)
            r = lo[:, :1].astype(jnp.int32) + (
                hi[:, :1].astype(jnp.int32) << 16
            )
            sub = sub + r
        return sub

    o_ref[:rows] = jax.lax.fori_loop(0, K, body, x_ref[:rows])
    if rows < BLOCK:
        o_ref[rows:] = x_ref[rows:]


def bench_red():
    import numpy as np

    shape = (BLOCK, 128)
    for kern, label, extra in (
        (_kernel_sumred, "sumred", ()),
        (_kernel_dotred, "dotred", (jnp.ones((128, 128), jnp.float32),)),
    ):
        in_specs = [pl.BlockSpec(shape, lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        if extra:
            in_specs.append(pl.BlockSpec((128, 128), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        f = pl.pallas_call(
            functools.partial(kern, rows=BLOCK),
            grid=(GRID,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(shape, lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BLOCK * GRID, 128), jnp.int32),
        )
        x = jnp.ones((BLOCK * GRID, 128), jnp.int32)
        fj = jax.jit(lambda x: f(x, *extra).sum())
        float(fj(x))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            float(fj(x))
        dt = (time.perf_counter() - t0) / reps
        nred = K * (N // 8)
        print(f"{label}: {dt * 1e3:8.2f} ms  "
              f"({dt / nred / GRID * 1e9:7.1f} ns/reduction/block)")


if __name__ == "__main__":
    import sys

    print(f"device: {jax.devices()[0].platform}")
    if "--red" in sys.argv:
        bench_red()
        raise SystemExit
    if "--dot" in sys.argv:
        for r in (128, 64, 32, 16):
            bench_dot(r)
        raise SystemExit
    if "--big" in sys.argv:
        for kern, label in ((_kernel_elem, "elem"), (_kernel_roll, "roll")):
            base = bench_big(kern, 128, label)
            for blk in (256, 512, 1024):
                t = bench_big(kern, blk, label)
                print(f"  {label} block {blk} / 128: {t / base:.2f}")
        raise SystemExit
    base_e = bench(_kernel_elem, 128, "elem")
    for r in (64, 32, 16, 8):
        t = bench(_kernel_elem, r, "elem")
        print(f"  elem [{r},128]/[128,128]: {t / base_e:.2f}")
    base_r = bench(_kernel_roll, 128, "roll")
    for r in (64, 32, 16, 8):
        t = bench(_kernel_roll, r, "roll")
        print(f"  roll [{r},128]/[128,128]: {t / base_r:.2f}")




