"""Search distillation: MCTS visit distributions teach the actor-critic.

AlphaZero-style policy improvement composed from the framework's own
pieces: ``search.mcts_moves_pallas`` plans for every agent on every board
(the search work rides the fused chunk kernel), and the conv actor-critic
(models/actor_critic.py) is trained to imitate the search -- cross-entropy
to the root visit distribution, MSE to the visit-weighted root Q.  Targets
come entirely from the search, so an iteration is rollout + SGD with no
GAE/bootstrap machinery.  The reference exists to make tree search and
learning feasible (pomcpp README.md:4) but ships neither; this module is
the two composed.

Acting during the rollout samples moves from the visit distribution
(softmax over visit counts at ``act_temperature``), the standard
exploration schedule for search-generated self-play data.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core.constants import AGENT_COUNT
from ..core.state import I32
from ..env.environment import EnvState, env_step_auto_reset_batch
from ..env.observation import DEFAULT_VIEW_RANGE as _VIEW
from ..env.observation import observe_ego
from ..models.actor_critic import obs_to_features
from ..search import mcts_moves_net, mcts_moves_pallas
from .ppo import _MODEL, TrainState


class DistillConfig(NamedTuple):
    rollout_len: int = 8
    max_episode_steps: int = 800  # official Pommerman cap; recycles
                                  # stalemated boards (see ppo.PPOConfig)
    n_sim: int = 16
    depth: int = 12
    max_tree_depth: int = 6
    lr: float = 3e-4
    value_coeff: float = 0.5
    max_grad_norm: float = 0.5
    num_minibatches: int = 2
    act_temperature: float = 1.0
    fused_env: bool = True      # step via the fused Pallas kernel
    interpret: bool = False     # interpret-mode kernels (CPU tests)
    guided: bool = False        # plan with mcts_moves_net (current net's
                                # priors + value leaves) instead of random
                                # playouts: the full AlphaZero loop.  Value
                                # targets then live on the net/terminal
                                # [-1, 1] scale instead of playout [0, 2].


def _optimizer(cfg: DistillConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )


def distill_init(key: jax.Array, cfg: DistillConfig = DistillConfig()):
    """TrainState with the distill optimizer (same params/model as PPO)."""
    from .ppo import ppo_init

    ts = ppo_init(key)
    return ts._replace(opt_state=_optimizer(cfg).init(ts.params))


def _all_agent_feats(game):
    """[B, 4, F] flat features for every agent of every board."""

    def per_board(g):
        return jax.vmap(
            lambda a: obs_to_features(observe_ego(g, a)).reshape(-1)
        )(jnp.arange(AGENT_COUNT, dtype=I32))

    return jax.vmap(per_board)(game)


def collect_search_rollout(es: EnvState, key, cfg: DistillConfig,
                           params=None):
    """Roll ``rollout_len`` steps, planning with MCTS for all 4 agents.

    Returns ``(es', feats [T,B,4,F], probs [T,B,4,6], value_t [T,B,4],
    weight [T,B,4])`` where ``probs`` is the normalized root visit
    distribution, ``value_t`` the visit-weighted root Q, and ``weight``
    masks dead agents and frozen post-terminal states out of the loss.
    """

    def body(es, k):
        ks = jax.random.split(k, AGENT_COUNT + 1)
        if cfg.guided:
            res = [
                mcts_moves_net(
                    es.game, jnp.asarray(a, I32), ks[a], _MODEL.apply,
                    params, n_sim=cfg.n_sim,
                    max_tree_depth=cfg.max_tree_depth,
                )
                for a in range(AGENT_COUNT)
            ]
        else:
            res = [
                mcts_moves_pallas(
                    es.game, jnp.asarray(a, I32), ks[a], n_sim=cfg.n_sim,
                    depth=cfg.depth, max_tree_depth=cfg.max_tree_depth,
                    interpret=cfg.interpret,
                )
                for a in range(AGENT_COUNT)
            ]
        visits = jnp.stack(
            [r[1] for r in res], axis=1
        ).astype(jnp.float32)                      # [B, 4, 6]
        qs = jnp.stack([r[2] for r in res], axis=1)
        probs = visits / jnp.maximum(visits.sum(-1, keepdims=True), 1.0)
        value_t = (probs * qs).sum(-1)             # [B, 4]
        feats = _all_agent_feats(es.game)
        weight = (
            (~es.game.agent_dead) & (~es.done)[:, None]
        ).astype(jnp.float32)

        logits = jnp.log(jnp.maximum(visits, 1e-9)) / cfg.act_temperature
        moves = jax.random.categorical(
            ks[AGENT_COUNT], logits, axis=-1
        ).astype(I32)                              # [B, 4]
        moves = jnp.where(es.game.agent_dead, 0, moves)
        es = env_step_auto_reset_batch(es, moves, fused=cfg.fused_env,
                                       max_steps=cfg.max_episode_steps)
        return es, (feats, probs, value_t, weight)

    keys = jax.random.split(key, cfg.rollout_len)
    es, (feats, probs, value_t, weight) = jax.lax.scan(body, es, keys)
    return es, feats, probs, value_t, weight


def _loss(params, batch, cfg: DistillConfig):
    feats, probs, value_t, w = batch               # [N,F],[N,6],[N],[N]
    side = 2 * _VIEW + 1

    def fwd(f):
        return _MODEL.apply(params, f.reshape(side, side, -1))

    logits, value = jax.vmap(fwd)(feats)
    logp = jax.nn.log_softmax(logits)
    pol = -(probs * logp).sum(-1)
    vloss = (value - value_t) ** 2
    denom = jnp.maximum(w.sum(), 1.0)
    loss = (w * (pol + cfg.value_coeff * vloss)).sum() / denom
    ent = -(w * (jnp.exp(logp) * logp).sum(-1)).sum() / denom
    return loss, {
        "loss": loss,
        "policy_ce": (w * pol).sum() / denom,
        "v_loss": (w * vloss).sum() / denom,
        "entropy": ent,
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def az_train_step(ts: TrainState, es: EnvState, cfg: DistillConfig):
    """One distillation iteration: search rollout + minibatched SGD."""
    key, k_roll, k_perm = jax.random.split(ts.key, 3)
    es, feats, probs, value_t, weight = collect_search_rollout(
        es, k_roll, cfg, ts.params
    )

    def flat(x):
        return x.reshape((-1,) + x.shape[3:])

    n = feats.shape[0] * feats.shape[1] * feats.shape[2]
    perm = jax.random.permutation(k_perm, n)
    data = tuple(
        jnp.take(flat(x), perm, axis=0)
        for x in (feats, probs, value_t, weight)
    )
    mb = n // cfg.num_minibatches
    opt = _optimizer(cfg)

    def mini(carry, i):
        params, opt_state = carry
        sl = tuple(
            jax.lax.dynamic_slice_in_dim(d, i * mb, mb) for d in data
        )
        (loss, metrics), grads = jax.value_and_grad(
            _loss, has_aux=True
        )(params, sl, cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), metrics

    (params, opt_state), metrics = jax.lax.scan(
        mini, (ts.params, ts.opt_state),
        jnp.arange(cfg.num_minibatches),
    )
    metrics = jax.tree.map(lambda x: x.mean(), metrics)
    ts = ts._replace(
        params=params, opt_state=opt_state, key=key,
        update_count=ts.update_count + 1,
    )
    return ts, es, metrics
