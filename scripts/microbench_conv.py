"""Is the actor-critic conv torso MXU-bound or padding-bound?

Compares XLA's conv_general_dilated lowering against an explicit
im2col+GEMM formulation of the SAME math at the production shapes
([B*4, 9, 9, 33] -> 64 -> 64 -> dense).  bf16 TPU tiles are (16, 128) on
the two minor dims: C_in=33 pads to 128 in the conv's activation layout
(~3.9x waste on the contraction) while im2col's K=297/576 pads to
384/640 (<1.3x waste).

Usage: python scripts/microbench_conv.py [--n=16384]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def t(name, fn, *args, n=16):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best * 1e3:.2f} ms", flush=True)
    return out


def im2col(x, k=3):
    """[N, H, W, C] -> [N, H, W, k*k*C] SAME-padded patch rows."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(k)
        for dx in range(k)
    ]
    return jnp.concatenate(cols, axis=-1)


def main():
    n = 16384
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 9, 9, 33)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 33, 64)) * 0.1, jnp.float32)
    b1 = jnp.zeros((64,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b2 = jnp.zeros((64,), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((5184, 128)) * 0.01, jnp.float32)

    def conv_path(x):
        y = jax.lax.conv_general_dilated(
            x, w1.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1.astype(jnp.bfloat16)
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b2.astype(jnp.bfloat16)
        y = jax.nn.relu(y)
        return y.reshape(n, -1) @ wd.astype(jnp.bfloat16)

    def gemm_path(x):
        p1 = im2col(x).reshape(n * 81, 297)
        y = p1 @ w1.reshape(297, 64).astype(jnp.bfloat16)
        y = jax.nn.relu(y + b1.astype(jnp.bfloat16))
        p2 = im2col(y.reshape(n, 9, 9, 64)).reshape(n * 81, 576)
        y = p2 @ w2.reshape(576, 64).astype(jnp.bfloat16)
        y = jax.nn.relu(y + b2.astype(jnp.bfloat16))
        return y.reshape(n, -1) @ wd.astype(jnp.bfloat16)

    # Wide-N variant: both convs' output channels live in ONE fused
    # [.., 128] matmul each... not math-identical, so just time the two
    # exact formulations.
    o1 = t("xla conv torso", jax.jit(conv_path), x)
    o2 = t("im2col gemm torso", jax.jit(gemm_path), x)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    print(f"max |diff|: {err:.4f} (bf16 noise expected)")


if __name__ == "__main__":
    main()
