"""Search distillation (learner/distill.py): one AZ-style iteration on CPU
(interpret-mode kernels): targets well-formed, params move, metrics finite."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.env import env_reset
from pomcpp_tpu.learner.distill import (
    DistillConfig,
    az_train_step,
    collect_search_rollout,
    distill_init,
)

CFG = DistillConfig(
    rollout_len=2, n_sim=4, depth=2, max_tree_depth=2,
    num_minibatches=2, fused_env=False, interpret=True,
)


def _env_batch(b=2, seed=0):
    return jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(seed), b)
    )


def test_search_rollout_targets_well_formed():
    es = _env_batch()
    es2, feats, probs, value_t, weight = collect_search_rollout(
        es, jax.random.PRNGKey(1), CFG
    )
    assert feats.shape[:3] == (2, 2, 4)
    assert probs.shape == (2, 2, 4, 6)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    v = np.asarray(value_t)
    assert (v >= 0).all() and (v <= 2.0).all()  # survival in [0, 2]
    # All agents start alive and no game ends instantly: full weight.
    assert (np.asarray(weight) >= 0).all()
    # The rollout advanced the games.
    assert (np.asarray(es2.game.timestep) == 2).all()


def test_az_train_step_updates_params():
    es = _env_batch()
    ts = distill_init(jax.random.PRNGKey(0), CFG)
    ts2, es2, metrics = az_train_step(ts, es, CFG)
    assert int(ts2.update_count) == int(ts.update_count) + 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # Parameters actually moved.
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params))
    )
    assert diff > 0


def test_guided_train_step_runs():
    """AlphaZero mode: net-guided PUCT targets, tiny CPU shapes."""
    import numpy as np

    cfg = DistillConfig(
        rollout_len=2, n_sim=4, max_tree_depth=3, num_minibatches=2,
        fused_env=False, guided=True,
    )
    ts = distill_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), 4)
    )
    ts, es, metrics = az_train_step(ts, es, cfg)
    assert int(ts.update_count) == 1
    assert np.isfinite(float(metrics["loss"]))
    # Guided value targets live on the [-1, 1] net/terminal scale.
    assert -1.001 <= float(metrics["v_loss"]) < 10.0
