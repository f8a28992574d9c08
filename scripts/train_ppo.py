#!/usr/bin/env python
"""Self-play PPO training driver.

Runs the full on-device loop: batched cellular envs -> rollout -> GAE ->
minibatched PPO updates, sharded over all local devices on a ``boards``
mesh, with periodic checkpointing.

Usage:
  python scripts/train_ppo.py --batch 256 --iters 50 --rollout 64 \
      --ckpt-dir build/ppo_ckpt [--resume]
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

# Persistent compile cache: the PPO train step costs minutes to compile on
# the TPU tunnel; cached recompiles are near-instant across runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "build", "jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--rollout", type=int, default=64)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--minibatches", type=int, default=0,
                   help="PPO minibatches per epoch; 0 = auto-scale so one "
                        "minibatch stays <= 128k samples (the conv fwd+bwd "
                        "activation temps are ~10 KB/sample; a 512k-sample "
                        "minibatch alone wants ~20 GB of HBM temps)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", type=str, default="")
    p.add_argument("--ckpt-every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--team", action="store_true", help="2v2 team mode")
    p.add_argument("--fused", action="store_true",
                   help="step rollouts through the fused Pallas kernel "
                        "(TPU; batch %% 256 == 0)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the shell's JAX_PLATFORMS "
                        "pin overrides the env var; only the in-process "
                        "config update works)")
    p.add_argument("--draw-penalty", type=float, default=0.0,
                   help="reward subtracted from survivors of a step-cap "
                        "draw (discourages running out the clock)")
    p.add_argument("--opponent", type=str, default="",
                   help="policy for the slots NOT in --learner-slots "
                        "(random/harmless/lazy/simple, or frozen / "
                        "frozen+simple for a frozen-net generation -- "
                        "see --frozen-ckpt); '' = self-play")
    p.add_argument("--learner-slots", type=str, default="0",
                   help="comma-separated net-controlled agent ids "
                        "(only with --opponent)")
    p.add_argument("--frozen-ckpt", type=str, default="",
                   help="checkpoint whose params drive the frozen-net "
                        "opponent slots (opponent=frozen/frozen+simple)")
    p.add_argument("--frozen-slots", type=str, default="",
                   help="comma-separated frozen-net agent ids for "
                        "opponent=frozen+simple (rest run SimpleAgent); "
                        "empty = all non-learner slots")
    p.add_argument("--view-range", type=int, default=4,
                   help="observation radius (4 = classic fogged 9x9 view; "
                        "10 = full observability, the fog-ablation control)")
    p.add_argument("--randomize-positions", action="store_true",
                   help="permute corner seats on every reset (reference "
                        "MakeGame's random_shuffle) so the learner trains "
                        "in all four seats")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # The platform decision is final here: lock only when the
    # real TPU client may open (no-op under --cpu).
    hold_tpu_client_lock()

    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.learner import PPOConfig, ppo_init, ppo_train_step
    from pomcpp_tpu.parallel import (boards_mesh, shard_batch,
                                     shard_env_batch)
    from pomcpp_tpu.utils import restore_checkpoint, save_checkpoint

    slots = tuple(
        int(s) for s in args.learner_slots.split(",")
    ) if args.opponent else (0, 1, 2, 3)
    mbs = args.minibatches
    if mbs <= 0:
        n = args.batch * args.rollout * len(slots)
        mbs = 2
        while n // mbs > 128 * 1024:
            mbs *= 2
    frozen_slots = tuple(
        int(s) for s in args.frozen_slots.split(",") if s != ""
    )
    cfg = PPOConfig(rollout_len=args.rollout, lr=args.lr, team_mode=args.team,
                    fused_env=args.fused, epochs=args.epochs,
                    minibatches=mbs,
                    draw_penalty=args.draw_penalty,
                    opponent=args.opponent,
                    learner_slots=slots,
                    frozen_slots=frozen_slots,
                    view_range=args.view_range,
                    randomize_positions=args.randomize_positions)
    ts = ppo_init(jax.random.PRNGKey(args.seed), cfg)
    frozen_params = None
    if args.opponent in ("frozen", "frozen+simple"):
        from pomcpp_tpu.utils import restore_checkpoint as _restore

        assert args.frozen_ckpt, "--opponent frozen needs --frozen-ckpt"
        frozen_params = _restore(args.frozen_ckpt, ts).params

    es = jax.vmap(
        lambda k: env_reset(k, engine="cellular",
                            randomize_positions=args.randomize_positions)
    )(jax.random.split(jax.random.PRNGKey(args.seed + 1), args.batch))

    if args.opponent:
        from pomcpp_tpu.learner.ppo import opponent_state_init

        opp = opponent_state_init(args.batch, cfg)
    else:
        opp = None

    # Resume restores the FULL training bundle (net/opt/key + env states +
    # opponent FSM state + iteration index) so a killed-and-resumed run
    # reproduces the straight-through run bit-for-bit
    # (tests/test_resume_equivalence.py).  The weights-only checkpoint
    # (the `ts` tree at ckpt_dir, what evaluate.py/league.py load) stays
    # the artifact format; the bundle lives under <ckpt_dir>/resume.
    start_it = 0
    resume_dir = os.path.join(args.ckpt_dir, "resume") if args.ckpt_dir else ""
    if args.resume and args.ckpt_dir and os.path.exists(args.ckpt_dir):
        if os.path.exists(resume_dir):
            import numpy as np

            bundle = restore_checkpoint(
                resume_dir,
                {"ts": ts, "es": es, "opp": opp, "it": np.zeros((), "int32")},
            )
            ts, es, opp = bundle["ts"], bundle["es"], bundle["opp"]
            start_it = int(bundle["it"])
            print(f"resumed full bundle from {resume_dir} at iter {start_it}")
        else:
            ts = restore_checkpoint(args.ckpt_dir, ts)
            print(f"resumed weights from {args.ckpt_dir} "
                  f"at update {int(ts.update_count)} (no env bundle)")

    mesh = boards_mesh()
    if args.batch % len(jax.devices()) == 0:
        es = shard_env_batch(es, mesh)
        if opp is not None:
            opp = shard_batch(opp, mesh)
        print(f"boards mesh over {len(jax.devices())} device(s)")

    if args.opponent:
        step = jax.jit(
            lambda ts, es, opp: ppo_train_step(
                ts, es, cfg, opp, frozen_params=frozen_params
            )
        )
    else:
        step = jax.jit(lambda ts, es: ppo_train_step(ts, es, cfg))

    def save_all(it):
        import numpy as np

        save_checkpoint(args.ckpt_dir, ts)
        save_checkpoint(
            resume_dir,
            {"ts": ts, "es": es, "opp": opp,
             "it": np.asarray(it + 1, "int32")},
        )

    steps_per_iter = args.batch * cfg.rollout_len
    for it in range(start_it, args.iters):
        t0 = time.perf_counter()
        if args.opponent:
            ts, es, metrics, opp = step(ts, es, opp)
        else:
            ts, es, metrics = step(ts, es)
        # Host fetch = real barrier (axon's block_until_ready can return
        # before the device work finishes); keep it inside the timed window.
        m = {k: float(v) for k, v in metrics.items()}
        dt = time.perf_counter() - t0
        m.update(
            iter=it,
            update=int(ts.update_count),
            env_steps_per_s=round(steps_per_iter / dt, 1),
            sec=round(dt, 2),
        )
        print(json.dumps(m))
        if args.ckpt_dir and (it + 1) % args.ckpt_every == 0:
            save_all(it)
            print(f"checkpointed -> {args.ckpt_dir}")

    if args.ckpt_dir:
        save_all(args.iters - 1)


if __name__ == "__main__":
    main()
