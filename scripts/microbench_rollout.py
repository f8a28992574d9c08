"""Attribute one PPO rollout step: obs/features vs conv apply vs env step.

The fused-profile split (profile_ppo.py --fused) showed the rollout at ~53%
of iteration time running at ~8% MXU -- overhead-bound somewhere.  This
times the pieces of one policy step at the production batch.

Usage: python scripts/microbench_rollout.py [--batch=4096]
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


def t(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])  # host fetch = barrier
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best * 1e3:.2f} ms", flush=True)
    return out


def main():
    batch = 4096
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            batch = int(a.split("=")[1])

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.core.state import I32
    from pomcpp_tpu.env.observation import observe_ego
    from pomcpp_tpu.learner.ppo import _MODEL, _policy_slots
    from pomcpp_tpu.models.actor_critic import obs_to_features

    from pomcpp_tpu.learner import ppo_init

    ts = ppo_init(jax.random.PRNGKey(0))
    params = ts.params
    games = jax.jit(jax.vmap(random_cell_state))(
        jax.random.split(jax.random.PRNGKey(1), batch)
    )
    keys = jax.random.split(jax.random.PRNGKey(2), batch)

    # 1. Full policy pass: nested-vmap composition vs the restructured
    # batch pass (featurize-once + flat apply; bit-identical outputs,
    # pinned by tests/test_learner.py::test_batched_collect_matches_vmapped).
    from pomcpp_tpu.learner.ppo import _policy_slots_batch

    slots = (0, 1, 2, 3)
    pol = jax.jit(
        lambda p, g, k: jax.vmap(
            lambda kk, gg: _policy_slots(p, gg, kk, slots)
        )(k, g)
    )
    t("policy pass, nested-vmap (obs+feats+apply+sample)", pol, params,
      games, keys)
    pol2 = jax.jit(lambda p, g, k: _policy_slots_batch(p, g, k, slots))
    t("policy pass, batch-restructured", pol2, params, games, keys)

    # 2. Observation + features only.
    def obs_feats(g):
        def per_board(gg):
            return jax.vmap(
                lambda a: obs_to_features(observe_ego(gg, a))
            )(jnp.arange(4, dtype=I32))

        return jax.vmap(per_board)(g)

    feats = t("obs+features (4 agents)", jax.jit(obs_feats), games)

    # 3. Conv apply + value on precomputed features.
    apply = jax.jit(
        lambda p, f: jax.vmap(jax.vmap(lambda x: _MODEL.apply(p, x)))(f)
    )
    t("model apply on feats", apply, params, feats)

    # 4. Sampling machinery alone (logits precomputed).
    logits = apply(params, feats)[0]

    def sample(k, lg):
        ks = jax.vmap(lambda kk: jax.random.split(kk, 4))(k)
        return jax.vmap(
            lambda kk, l: jax.vmap(jax.random.categorical)(kk, l)
        )(ks, lg)

    t("key split + categorical", jax.jit(sample), keys, logits)

    # 5. Fused env step exactly as the self-play rollout takes it.
    from pomcpp_tpu.env.environment import (EnvState,
                                            env_step_auto_reset_batch)

    es = EnvState(
        game=games,
        done=jnp.zeros((batch,), bool),
        winner=jnp.full((batch,), -1, I32),
        is_draw=jnp.zeros((batch,), bool),
        key=keys,
    )
    moves = jnp.zeros((batch, 4), I32)
    env1 = jax.jit(
        lambda e, mv: env_step_auto_reset_batch(e, mv, fused=True,
                                                max_steps=800)
    )
    t("fused env step + done/reset merge", env1, es, moves)


if __name__ == "__main__":
    main()
