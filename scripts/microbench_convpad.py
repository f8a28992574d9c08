"""VERDICT r4 item 8: does padding/widening the ego-feature channel axis
to MXU tile boundaries speed the PPO update?

The torso runs ~26% MXU standalone and the update ~60 eff TFLOP/s
(docs/PERF.md); the K=297/576-vs-128-lane tiling diagnosis left one lever
untried: make C_in (and the conv channel count) fill the 128-lane tile.
This measures the conv torso forward AND a fwd+bwd update step across a
(C_in, channels) grid at the production minibatch shape.  If time is flat
in C_in below 128, the activation layout already pads C_in to the tile and
no restructuring of the 23-channel features can recover that waste --
the negative result to record.

Usage: python scripts/microbench_convpad.py [--n=131072]
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


def t(name, fn, *args, n=8):
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
    return best


def main():
    n = 131072  # one auto-scaled minibatch (128k samples)
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=")[1])
    rng = np.random.default_rng(0)

    for c_in, ch in [(23, 64), (32, 64), (64, 64), (128, 64),
                     (23, 128), (128, 128)]:
        x = jnp.asarray(rng.standard_normal((n, 9, 9, c_in)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, c_in, ch)) * 0.1,
                         jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, ch, ch)) * 0.1,
                         jnp.bfloat16)
        wd = jnp.asarray(rng.standard_normal((81 * ch, 128)) * 0.01,
                         jnp.bfloat16)

        def fwd(x, w1, w2, wd):
            y = jax.lax.conv_general_dilated(
                x, w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.relu(y)
            y = jax.lax.conv_general_dilated(
                y, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.relu(y)
            return y.reshape(y.shape[0], -1) @ wd

        def loss(params, x):
            w1, w2, wd = params
            return jnp.sum(fwd(x, w1, w2, wd).astype(jnp.float32)) * 1e-6

        flops_fwd = 2 * n * 81 * (9 * c_in * ch + 9 * ch * ch + ch * 128 / 81)
        ms_f = t(f"fwd  C={c_in:3d} ch={ch:3d}", jax.jit(fwd), x, w1, w2, wd)
        g = jax.jit(jax.grad(loss))
        ms_g = t(f"grad C={c_in:3d} ch={ch:3d}", g, (w1, w2, wd), x)
        print(f"     eff fwd {flops_fwd / ms_f / 1e12:.1f} TFLOP/s, "
              f"fwd+bwd {3 * flops_fwd / ms_g / 1e12:.1f} TFLOP/s "
              f"(v5e peak ~197 bf16)", flush=True)


if __name__ == "__main__":
    main()
