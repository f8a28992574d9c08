"""PPO learner smoke + correctness tests (small shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.env import env_reset
from pomcpp_tpu.learner import PPOConfig, ppo_init, ppo_train_step
from pomcpp_tpu.learner.ppo import Transition, compute_gae


def _small_cfg():
    return PPOConfig(rollout_len=8, epochs=1, minibatches=2)


def test_gae_matches_reference_impl():
    T = 5
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, 4).astype(np.float32)
    values = rng.randn(T, 4).astype(np.float32)
    dones = (rng.rand(T, 4) < 0.2).astype(np.float32)
    boot = rng.randn(4).astype(np.float32)
    cfg = PPOConfig(gamma=0.9, lam=0.8)

    board_done = dones[:, 0] > 0.5
    died = dones > 0.8  # sparse per-agent deaths on non-boundary steps
    term = board_done[:, None] | died
    tr = Transition(
        feats=jnp.zeros((T, 4, 1)),
        move=jnp.zeros((T, 4), jnp.int32),
        logp=jnp.zeros((T, 4)),
        value=jnp.asarray(values),
        reward=jnp.asarray(rewards),
        alive=jnp.ones((T, 4), bool),
        done=jnp.asarray(board_done),
        term=jnp.asarray(term),
        draw=jnp.zeros((T,), bool),
        valid=jnp.ones((T,), bool),
    )
    adv, ret = compute_gae(tr, jnp.asarray(boot), cfg)

    # Straightforward python reference (per-agent truncation).
    adv_ref = np.zeros((T, 4), np.float32)
    gae = np.zeros(4, np.float32)
    next_v = boot.copy()
    for t in reversed(range(T)):
        nonterm = 1.0 - term[t].astype(np.float32)
        delta = rewards[t] + cfg.gamma * next_v * nonterm - values[t]
        gae = delta + cfg.gamma * cfg.lam * nonterm * gae
        adv_ref[t] = gae
        next_v = values[t]
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ret), adv_ref + values, rtol=1e-5
    )


def test_train_step_runs_and_updates_params():
    cfg = _small_cfg()
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), 4)
    )
    step = jax.jit(lambda ts, es: ppo_train_step(ts, es, cfg))
    ts2, es2, metrics = step(ts, es)
    assert int(ts2.update_count) == 1
    assert np.isfinite(float(metrics["loss"]))
    # Parameters actually moved.
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params
    )
    assert max(jax.tree.leaves(moved)) > 0
    # Env advanced.
    assert int(np.asarray(es2.game.timestep).max()) > 0


def test_train_step_sharded_over_mesh():
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pomcpp_tpu.parallel import boards_mesh, shard_env_batch

    cfg = _small_cfg()
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), 8)
    )
    mesh = boards_mesh()
    es = shard_env_batch(es, mesh)
    step = jax.jit(lambda ts, es: ppo_train_step(ts, es, cfg))
    ts2, es2, metrics = step(ts, es)
    assert np.isfinite(float(metrics["loss"]))


def test_team_mode_train_step():
    cfg = PPOConfig(rollout_len=8, epochs=1, minibatches=2, team_mode=True)
    import jax as _jax

    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.learner import ppo_init, ppo_train_step

    ts = ppo_init(_jax.random.PRNGKey(0), cfg)
    es = _jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        _jax.random.split(_jax.random.PRNGKey(2), 4)
    )
    step = _jax.jit(lambda ts, es: ppo_train_step(ts, es, cfg))
    ts2, es2, metrics = step(ts, es)
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.update_count) == 1


def test_batched_collect_matches_vmapped():
    """collect_rollout_batch (fused_env plumbing, XLA path) must reproduce
    jax.vmap(collect_rollout) bit-for-bit -- same key splits, same layout."""
    import numpy as np

    from pomcpp_tpu.learner.ppo import (
        collect_rollout,
        collect_rollout_batch,
    )

    cfg = _small_cfg()
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(3), 4)
    )
    ref_final, ref_traj, ref_boot = jax.jit(
        jax.vmap(lambda e: collect_rollout(ts.params, e, cfg))
    )(es)
    got_final, got_traj, got_boot = jax.jit(
        lambda e: collect_rollout_batch(ts.params, e, cfg)
    )(es)
    for a, b in zip(jax.tree.leaves(ref_traj), jax.tree.leaves(got_traj)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_final), jax.tree.leaves(got_final)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(ref_boot), np.asarray(got_boot))


def test_opponent_slots_follow_scripted_policy():
    """opponent='lazy' slots never move; only learner slots are stored."""
    from pomcpp_tpu.learner.ppo import collect_rollout_batch

    cfg = PPOConfig(rollout_len=6, epochs=1, minibatches=2,
                    opponent="lazy", learner_slots=(0,))
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(5), 8)
    )
    x0 = np.asarray(es.game.agent_x)
    y0 = np.asarray(es.game.agent_y)
    es_final, traj, boot, opp = jax.jit(
        lambda e: collect_rollout_batch(ts.params, e, cfg)
    )(es)
    # Learner-only storage: [B, T, 1, ...].
    assert traj.move.shape == (8, 6, 1)
    assert traj.feats.shape[:3] == (8, 6, 1)
    assert boot.shape == (8, 1)
    # No board finishes in 6 steps (bombs need 10 to blow), so lazy
    # opponents (slots 1-3) stand still the whole rollout.
    xf = np.asarray(es_final.game.agent_x)
    yf = np.asarray(es_final.game.agent_y)
    assert np.array_equal(x0[:, 1:], xf[:, 1:])
    assert np.array_equal(y0[:, 1:], yf[:, 1:])
    # The learner acts with a fresh random net: someone moved somewhere.
    assert (x0[:, 0] != xf[:, 0]).any() or (y0[:, 0] != yf[:, 0]).any()


def test_opponent_simple_train_step_runs():
    """Full train step vs SimpleAgent opponents: loss finite, FSM threaded."""
    from pomcpp_tpu.learner.ppo import opponent_state_init

    cfg = PPOConfig(rollout_len=4, epochs=1, minibatches=2,
                    opponent="simple", learner_slots=(0,))
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(6), 4)
    )
    opp = opponent_state_init(4)
    step = jax.jit(lambda ts, es, opp: ppo_train_step(ts, es, cfg, opp))
    ts, es, metrics, opp = step(ts, es, opp)
    ts, es, metrics, opp = step(ts, es, opp)
    assert int(ts.update_count) == 2
    assert np.isfinite(float(metrics["loss"]))
    # The FSM state advanced (recent-position ring counts grow from 0).
    assert np.asarray(opp.rp_count).sum() > 0


def test_opponent_frozen_train_step_runs():
    """Generational mode: opponent slots driven by a FROZEN net.  The train
    step runs, updates the learner, and leaves the frozen params untouched;
    the frozen net's moves actually differ from lazy idling."""
    cfg = PPOConfig(rollout_len=4, epochs=1, minibatches=2,
                    opponent="frozen", learner_slots=(0,))
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    frozen = ppo_init(jax.random.PRNGKey(99), cfg).params
    frozen_copy = jax.tree.map(np.asarray, frozen)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(6), 4)
    )
    x0 = np.asarray(es.game.agent_x)
    y0 = np.asarray(es.game.agent_y)
    step = jax.jit(lambda ts, es: ppo_train_step(
        ts, es, cfg, frozen_params=frozen))
    ts, es, metrics, _ = step(ts, es)
    ts, es, metrics, _ = step(ts, es)
    assert int(ts.update_count) == 2
    assert np.isfinite(float(metrics["loss"]))
    # Frozen opponents acted (a random-init net moves somebody).
    xf = np.asarray(es.game.agent_x)
    yf = np.asarray(es.game.agent_y)
    assert (x0[:, 1:] != xf[:, 1:]).any() or (y0[:, 1:] != yf[:, 1:]).any()
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(frozen_copy)):
        assert np.array_equal(np.asarray(a), b)


def test_opponent_frozen_plus_simple_mixture():
    """frozen+simple: frozen_slots run the frozen net, the rest SimpleAgent;
    storage still carries only learner slots and the FSM state threads."""
    from pomcpp_tpu.learner.ppo import (
        collect_rollout_batch,
        opponent_state_init,
    )

    cfg = PPOConfig(rollout_len=5, epochs=1, minibatches=2,
                    opponent="frozen+simple", learner_slots=(0,),
                    frozen_slots=(2,))
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    frozen = ppo_init(jax.random.PRNGKey(99), cfg).params
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(7), 4)
    )
    opp = opponent_state_init(4, cfg)
    es_final, traj, boot, opp2 = jax.jit(
        lambda e, o: collect_rollout_batch(
            ts.params, e, cfg, o, frozen_params=frozen)
    )(es, opp)
    assert traj.move.shape == (4, 5, 1)  # [B, T, L] default layout
    assert np.asarray(opp2.rp_count).sum() > 0  # SimpleAgents (1,3) acted


def test_draw_penalty_on_step_cap_timeout():
    """A step-cap draw pays -draw_penalty to surviving learners, exactly on
    the episode-boundary step, in both rollout collectors."""
    from pomcpp_tpu.learner.ppo import collect_rollout, collect_rollout_batch

    base = dict(rollout_len=8, epochs=1, minibatches=2,
                opponent="lazy", learner_slots=(0,), max_episode_steps=3)
    cfg = PPOConfig(draw_penalty=0.5, **base)
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(7), 4)
    )
    _, traj, _, _ = jax.jit(
        lambda e: collect_rollout_batch(ts.params, e, cfg)
    )(es)
    done = np.asarray(traj.done)          # [B, T]
    valid = np.asarray(traj.valid)
    alive = np.asarray(traj.alive[..., 0])
    reward = np.asarray(traj.reward[..., 0])
    boundary = done & valid & alive       # cap fires with everyone alive
    assert boundary.any(), "no episode hit the 3-step cap"
    assert np.all(reward[boundary] == -0.5)
    assert np.all(reward[~boundary] == 0.0)

    # Zero penalty (default): identical setup pays nothing on the draw.
    cfg0 = PPOConfig(draw_penalty=0.0, **base)
    _, traj0, _, _ = jax.jit(
        lambda e: collect_rollout_batch(ts.params, e, cfg0)
    )(es)
    assert np.all(np.asarray(traj0.reward) == 0.0)

    # The vmapped single-board collector applies the same penalty (self-play
    # config: it has no opponent plumbing).
    cfgv = PPOConfig(rollout_len=8, epochs=1, minibatches=2,
                     max_episode_steps=3, draw_penalty=0.25)
    _, trajv, _ = jax.jit(
        jax.vmap(lambda e: collect_rollout(ts.params, e, cfgv))
    )(es)
    rv = np.asarray(trajv.reward)
    bv = (np.asarray(trajv.done) & np.asarray(trajv.valid))[..., None] \
        & np.asarray(trajv.alive)
    assert bv.any()
    assert np.all(rv[bv] == -0.25)


def test_policy_slots_batch_matches_nested_vmap():
    """_policy_slots_batch (featurize-once + flat apply; a measured TPU
    negative result kept for the record) stays bit-identical to the
    nested-vmap composition it restructures."""
    from pomcpp_tpu.learner.ppo import _policy_slots, _policy_slots_batch

    ts = ppo_init(jax.random.PRNGKey(0))
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(11), 6)
    )
    keys = jax.random.split(jax.random.PRNGKey(12), 6)
    for slots in ((0, 1, 2, 3), (0, 2)):
        ref = jax.jit(
            lambda k, g: jax.vmap(
                lambda kk, gg: _policy_slots(ts.params, gg, kk, slots)
            )(k, g)
        )(keys, es.game)
        got = jax.jit(
            lambda k, g: _policy_slots_batch(ts.params, g, k, slots)
        )(keys, es.game)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
