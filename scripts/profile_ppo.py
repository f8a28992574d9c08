"""Attribute PPO iteration time: rollout vs GAE vs update.

Usage: python scripts/profile_ppo.py [--batch 2048] [--rollout 32] [--fused]

``--fused`` profiles the production configuration (collect_rollout_batch
over the fused Pallas env step, time-major layout); default is the
reference vmapped path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402
hold_tpu_client_lock()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402


def main():
    batch = 2048
    rollout = 32
    epochs = 0
    minibatches = 0
    fused = "--fused" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            batch = int(a.split("=")[1])
        if a.startswith("--rollout"):
            rollout = int(a.split("=")[1])
        if a.startswith("--epochs"):
            epochs = int(a.split("=")[1])
        if a.startswith("--minibatches"):
            minibatches = int(a.split("=")[1])

    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.learner import PPOConfig, ppo_init
    from pomcpp_tpu.learner.ppo import (
        collect_rollout,
        collect_rollout_batch,
        compute_gae,
        ppo_update,
    )

    if not minibatches:
        n = batch * rollout * 4
        minibatches = 2
        while n // minibatches > 128 * 1024:
            minibatches *= 2
    cfg = PPOConfig(rollout_len=rollout, fused_env=fused,
                    epochs=epochs or (1 if fused else 2),
                    minibatches=minibatches)
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), batch)
    )

    if fused:
        roll = jax.jit(
            lambda params, es: collect_rollout_batch(
                params, es, cfg, time_major=True
            )
        )
        gae = jax.jit(
            lambda traj, boot: jax.vmap(
                lambda t, b: compute_gae(t, b, cfg),
                in_axes=(1, 0), out_axes=1,
            )(traj, boot)
        )
    else:
        roll = jax.jit(
            lambda params, es: jax.vmap(
                lambda e: collect_rollout(params, e, cfg)
            )(es)
        )
        gae = jax.jit(
            lambda traj, boot: jax.vmap(lambda t, b: compute_gae(t, b, cfg))(
                traj, boot
            )
        )

    def flatten(traj, adv, ret):
        def flat(x):
            return x.reshape((-1,) + x.shape[3:])

        return (
            flat(traj.feats), flat(traj.move), flat(traj.logp),
            flat(adv), flat(ret), flat(traj.alive & traj.valid[:, :, None]),
        )

    upd = jax.jit(lambda ts, fb: ppo_update(ts, fb, cfg))

    def t(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            # honest barrier: fetch a leaf scalar
            leaf = jax.tree.leaves(out)[0]
            float(jnp.asarray(leaf).reshape(-1)[0])
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times) * 1e3:.0f} ms", flush=True)
        return out

    es2, traj, boot = t("rollout", roll, ts.params, es)
    adv, ret = t("gae", gae, traj, boot)
    fb = jax.jit(flatten)(traj, adv, ret)
    jax.block_until_ready(fb)
    t("update", upd, ts, fb)
    n = batch * rollout
    print(
        f"(batch {batch} x rollout {rollout} = {n} env-steps/iter; "
        f"fused={fused} epochs={cfg.epochs} minibatches={cfg.minibatches})"
    )


if __name__ == "__main__":
    main()
