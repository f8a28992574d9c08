#!/usr/bin/env python
"""Search-distillation training: MCTS plans, the actor-critic imitates.

AlphaZero-style loop over the framework's own pieces (learner/distill.py);
see that module's docstring.  The search work rides the fused Pallas chunk
kernel, the env steps ride pallas_step.

Usage: python scripts/train_az.py [--batch 1024] [--iters 20]
           [--rollout 8] [--sims 16] [--depth 12] [--ckpt-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--rollout", type=int, default=8)
    p.add_argument("--sims", type=int, default=16)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--tree-depth", type=int, default=6)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", type=str, default="")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--guided", action="store_true",
                   help="net-guided PUCT targets (mcts_moves_net) instead "
                        "of random playouts -- full AlphaZero loop")
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint dir to warm-start params from")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # The platform decision is final here: lock only when the
    # real TPU client may open (no-op under --cpu).
    hold_tpu_client_lock()

    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.learner.distill import (
        DistillConfig,
        az_train_step,
        distill_init,
    )
    from pomcpp_tpu.utils import save_checkpoint

    fused = not args.cpu and args.batch % 256 == 0
    cfg = DistillConfig(
        rollout_len=args.rollout, n_sim=args.sims, depth=args.depth,
        max_tree_depth=args.tree_depth, lr=args.lr, fused_env=fused,
        interpret=args.cpu, guided=args.guided,
    )
    ts = distill_init(jax.random.PRNGKey(args.seed), cfg)
    if args.resume:
        from pomcpp_tpu.utils import restore_checkpoint

        ts = restore_checkpoint(args.resume, ts)
        print(f"warm-started params from {args.resume}")
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(args.seed + 1), args.batch)
    )

    steps_per_iter = args.batch * cfg.rollout_len
    for it in range(args.iters):
        t0 = time.perf_counter()
        ts, es, metrics = az_train_step(ts, es, cfg)
        # Host fetch = real barrier (axon's block_until_ready is not).
        m = {k: float(v) for k, v in metrics.items()}
        dt = time.perf_counter() - t0
        m.update(
            iter=it,
            update=int(ts.update_count),
            env_steps_per_s=round(steps_per_iter / dt, 1),
            search_steps_per_s=round(
                steps_per_iter * 4 * cfg.n_sim
                * (cfg.max_tree_depth + cfg.depth) / dt, 1,
            ),
            sec=round(dt, 2),
        )
        print(json.dumps(m), flush=True)
        if args.ckpt_dir:
            save_checkpoint(args.ckpt_dir, ts)


if __name__ == "__main__":
    main()
