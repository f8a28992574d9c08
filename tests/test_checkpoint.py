"""Checkpoint save/restore roundtrip (npz backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.learner import PPOConfig, ppo_init
from pomcpp_tpu.utils import restore_checkpoint, save_checkpoint


def test_train_state_roundtrip(tmp_path):
    ts = ppo_init(jax.random.PRNGKey(3), PPOConfig(rollout_len=4))
    ts = ts._replace(update_count=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path / "ck"), ts)

    fresh = ppo_init(jax.random.PRNGKey(99), PPOConfig(rollout_len=4))
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert int(restored.update_count) == 7
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_state_roundtrip(tmp_path):
    from pomcpp_tpu.env import env_reset

    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), 4)
    )
    save_checkpoint(str(tmp_path / "env"), es)
    es2 = restore_checkpoint(str(tmp_path / "env"), es)
    for a, b in zip(jax.tree.leaves(es), jax.tree.leaves(es2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
