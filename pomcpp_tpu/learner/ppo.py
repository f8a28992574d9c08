"""Self-play PPO learner over the cellular environment.

The reference ships no learner (SURVEY.md §2.6 P4); this is the north-star
training stack: all four agents share one actor-critic policy, rollouts run
fully on-device through the cellular step (one lax.scan, no host round
trips), and the update is standard clipped PPO with GAE.

Scaling story (SURVEY.md §2.6 P3/P6): the board batch is the only parallel
axis.  Under a ``boards`` mesh the rollout is embarrassingly parallel and
the gradient all-reduce is the only collective; both emerge automatically
from sharding annotations -- the train step is written as plain jit-able
code over the global batch.

Rewards (per agent, sparse, standard Pommerman shaping):
  +1 on the step their game ends won; -1 on the step they die; 0 otherwise.

Besides shared-policy self-play, ``PPOConfig.opponent`` trains a learner
against scripted opponents (the standard Pommerman curriculum): slots
outside ``learner_slots`` are driven by random/harmless/lazy or the
conformance SimpleAgent FSM (agents/simple_cellular.py, the policy the
reference benchmarks with -- performance_test.cpp:38), and only learner
transitions enter GAE and the loss.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..agents import harmless_agent, lazy_agent, random_agent
from ..agents.simple import simple_agent_init_batch
from ..agents.simple_cellular import simple_agent_cell_joint
from ..core.constants import AGENT_COUNT
from ..core.constants import C_AGENT0 as _C_AGENT0
from ..core.state import I32
from ..env.environment import TEAM_OF, EnvState, act_all, env_step_auto_reset
from ..env.observation import observe_ego
from ..env.observation import DEFAULT_VIEW_RANGE as _VIEW
from ..models.actor_critic import ActorCritic, obs_to_features


class PPOConfig(NamedTuple):
    rollout_len: int = 64
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    epochs: int = 2
    minibatches: int = 2  # large-batch regime: fewer/bigger minibatches
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    max_grad_norm: float = 0.5
    team_mode: bool = False  # 2v2 ({0,2} vs {1,3}); shared team rewards
    fused_env: bool = False  # step rollouts through the fused Pallas
                             # kernel (TPU; batch % 256 == 0) instead of
                             # ~600 launch-bound XLA ops per step
    opponent: str = ""       # "" = shared-policy self-play; else the agent
                             # slots NOT in learner_slots are driven by this
                             # opponent policy (random/harmless/lazy/simple)
                             # and excluded from rollout storage and loss --
                             # the standard Pommerman curriculum (train one
                             # learner against the reference SimpleAgent).
                             # "frozen": those slots act via a FROZEN net
                             # (pass frozen_params to ppo_train_step) -- the
                             # generational self-improvement mode (train
                             # gen-2 against gen-1).  "frozen+simple":
                             # cfg.frozen_slots act via the frozen net, the
                             # remaining non-learner slots via SimpleAgent
                             # (the mixture curriculum).
    learner_slots: tuple = (0, 1, 2, 3)  # net-controlled agent ids (static)
    frozen_slots: tuple = ()  # slots driven by the frozen net under
                              # opponent="frozen+simple"; with "frozen",
                              # defaults to all non-learner slots
    max_episode_steps: int = 800  # official Pommerman step cap (draw);
                                  # without it a stalemated board (e.g. the
                                  # learner dead, two SimpleAgents dodging
                                  # forever) never resets and stops
                                  # producing training signal.  0 disables.
    draw_penalty: float = 0.0     # reward subtracted from agents still
                                  # alive when an episode ends with no
                                  # winner (step-cap timeout): surviving a
                                  # stalemate is NOT a win, and without
                                  # this the policy happily dances out the
                                  # clock (~16% of eval games timed out).
    shuffle_minibatches: bool = True  # permute rows across minibatches
                                  # each epoch (standard PPO); False slices
                                  # contiguous slabs -- no gather, no
                                  # permutation copy (boards are iid, so
                                  # with epochs=1 the bias is negligible).
    view_range: int = _VIEW       # observation radius (ego crop is
                                  # (2R+1)^2).  4 = classic fogged 9x9;
                                  # 10 covers the whole board from any
                                  # cell = full observability (the fog
                                  # ablation's control arm).
    randomize_positions: bool = False  # permute corner seats on every
                                  # auto-reset (reference MakeGame's
                                  # std::random_shuffle, environment.cpp:60)
                                  # so the learner trains in all seats --
                                  # eval rotates seats, and a fixed-seat-
                                  # trained net is out of distribution in
                                  # 3 of 4 of them (VERDICT r2 item 4).


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    update_count: jax.Array


_MODEL = ActorCritic()


def _optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )


def ppo_init(key: jax.Array, cfg: PPOConfig = PPOConfig()) -> TrainState:
    from ..core.board_gen import random_cell_state

    game = random_cell_state(jax.random.PRNGKey(0))
    feats = obs_to_features(
        observe_ego(game, 0, view_range=cfg.view_range), cfg.view_range
    )
    params = _MODEL.init(key, feats)
    return TrainState(
        params=params,
        opt_state=_optimizer(cfg).init(params),
        key=key,
        update_count=jnp.zeros((), I32),
    )


def _policy_slots(params, game, key, slots, view_range: int = _VIEW):
    """Sample net moves for the given agent ids -> (moves, logp, value, feats)."""

    def one(k, aid):
        obs = observe_ego(game, aid, view_range=view_range)
        feats = obs_to_features(obs, view_range)
        logits, value = _MODEL.apply(params, feats)
        move = jax.random.categorical(k, logits)
        logp = jax.nn.log_softmax(logits)[move]
        return move.astype(I32), logp, value, feats

    keys = jax.random.split(key, len(slots))
    ids = jnp.asarray(slots, I32)
    return jax.vmap(one)(keys, ids)


def _policy_all_agents(params, game, key, view_range: int = _VIEW):
    """Sample moves for all 4 agents -> (moves, logp, value, feats)."""
    return _policy_slots(params, game, key, tuple(range(AGENT_COUNT)),
                         view_range)


def _policy_slots_batch(params, games, keys, slots):
    """``vmap(_policy_slots)`` restructured: featurize-once + flat apply.

    MEASURED NEGATIVE RESULT (r3, kept for the record + the bit-equality
    test pinning the commuted featurization): outputs are bit-identical
    to the nested-vmap composition (same key flow, same conv shapes,
    exact selection crops), but on a v5e at batch 4096 it is ~25% SLOWER
    standalone (14.4 vs 11.6 ms, scripts/microbench_rollout.py) and ~65%
    slower inside the rollout scan (1040 vs 622 ms/iter) -- the feature-
    space crop einsums ([B,4,9,19]x[B,19,19,17] contractions) lower
    worse than the per-agent [9,19]x[19,19]x[19,9] selection chains,
    which XLA fuses tightly into the conv's input.  Do NOT wire this
    back into collect_rollout_batch without re-measuring.

    Exactness notes (why bit-identical): featurize-then-crop commutes
    with crop-then-featurize because featurization is per-cell and the
    one-hot crop matmuls are pure selections (a single 1.0-weighted term
    per output -- exact even through bf16 matmul passes since every
    value is a small int); scalar /10.0 divisions happen after the crop
    on the same f32 int values.

    Returns (moves, logp, value, feats) with leaves [B, L, ...].
    """
    import numpy as np

    from ..core.constants import BOARD_SIZE, C_RIGID
    from ..env.observation import DEFAULT_VIEW_RANGE as _R
    from ..models.actor_critic import _N_CLASSES

    B = games.board.shape[0]
    L = len(slots)
    sl = jnp.asarray(slots, I32)
    r = _R
    w = 2 * r + 1
    pw = BOARD_SIZE + 2 * r

    # Per-cell feature planes, one pass per BOARD.  The scalar channels
    # stay RAW integers here and are scaled after the crop: every value in
    # the einsum is then a small int or a one-hot 1.0, exact even if the
    # default TPU matmul precision routes f32 operands through bf16
    # passes (ints <= 255 are bf16-exact; 0.3 is not).
    board = games.board
    cls = jnp.where(board >= _C_AGENT0, board - _C_AGENT0 + 9, board)
    onehot = jax.nn.one_hot(jnp.clip(cls, 0, _N_CLASSES - 1), _N_CLASSES)
    scalars = jnp.stack(
        [
            games.bomb_timer,
            games.bomb_strength,
            games.bomb_dir,
            games.flame_timer,
        ],
        axis=-1,
    ).astype(jnp.float32)
    fmap = jnp.concatenate([onehot, scalars], axis=-1)  # [B, 121, C]
    C = fmap.shape[-1]
    fmap = fmap.reshape(B, BOARD_SIZE, BOARD_SIZE, C)   # [B, y, x, C]
    fmap = jnp.pad(fmap, ((0, 0), (r, r), (r, r), (0, 0)))
    # Out-of-board cells read RIGID: its feature vector is one_hot(RIGID)
    # with zero scalars, so only the RIGID class channel needs filling.
    interior = np.zeros((pw, pw), np.float32)
    interior[r:-r, r:-r] = 1.0
    rigid_ch = jnp.asarray(1.0 - interior)
    fmap = fmap.at[..., C_RIGID].add(rigid_ch)

    ax = games.agent_x[:, sl]                           # [B, L]
    ay = games.agent_y[:, sl]
    rows = jax.nn.one_hot(ay[..., None] + jnp.arange(w), pw)  # [B, L, w, pw]
    cols = jax.nn.one_hot(ax[..., None] + jnp.arange(w), pw)
    t = jnp.einsum("baiw,bwvc->baivc", rows, fmap)
    crop = jnp.einsum("baivc,bajv->baijc", t, cols)     # [B, L, w, w, C]
    # Deferred scaling of the raw scalar channels: the same f32 division
    # of the same int-valued f32 obs_to_features performs (x*0.1 could
    # round differently than x/10.0; division keeps it bit-identical).
    denom = jnp.concatenate(
        [
            jnp.ones((_N_CLASSES,), jnp.float32),
            jnp.asarray([10.0, 10.0, 4.0, 4.0], jnp.float32),
        ]
    )
    crop = crop / denom

    stats = jnp.stack(
        [
            games.agent_max_bombs[:, sl] / 5.0,
            games.agent_bomb_count[:, sl] / 5.0,
            games.agent_strength[:, sl] / 10.0,
            games.agent_can_kick[:, sl].astype(jnp.float32),
            ax / 10.0,
            ay / 10.0,
        ],
        axis=-1,
    )                                                    # [B, L, 6]
    stats = jnp.broadcast_to(stats[:, :, None, None, :], (B, L, w, w, 6))
    feats = jnp.concatenate([crop, stats], axis=-1).astype(jnp.bfloat16)

    logits, value = jax.vmap(lambda f: _MODEL.apply(params, f))(
        feats.reshape(B * L, w, w, C + 6)
    )
    logits = logits.reshape(B, L, -1)
    value = value.reshape(B, L)

    # Key flow identical to vmap(_policy_slots): one split per board into
    # L per-agent keys, one categorical per (board, agent).
    ks = jax.vmap(lambda k: jax.random.split(k, L))(keys)  # [B, L, 2]
    moves = jax.vmap(jax.vmap(jax.random.categorical))(ks, logits)
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, moves[..., None], axis=-1)[..., 0]
    return moves.astype(I32), logp, value, feats


def opponent_state_init(batch: int, cfg: "PPOConfig | None" = None):
    """Fresh per-board scripted-opponent FSM state ([B, 4, ...] pytree).

    Only the SimpleAgent opponent is stateful; the same pytree is threaded
    (and ignored) for the stateless ones so carriers have a fixed structure.
    With ``cfg.fused_env`` and a simple opponent the FSM runs INSIDE the
    fused kernel (engine/pallas_fsm.py), whose state is the kernel 10-tuple
    instead of the XLA toolkit pytree.
    """
    if (cfg is not None and cfg.fused_env
            and cfg.opponent in ("simple", "frozen+simple")):
        from ..engine.pallas_step import simple_fsm_state_init

        return simple_fsm_state_init(batch)
    st = simple_agent_init_batch()
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), st
    )


def _opponent_moves_batch(name, keys, games, opp_state):
    """Scripted moves for ALL 4 slots on every board -> (i32[B,4], state')."""
    if name == "simple":
        moves, opp2 = jax.vmap(simple_agent_cell_joint)(keys, games, opp_state)
        return jnp.where(games.agent_dead, 0, moves).astype(I32), opp2
    pol = {
        "random": random_agent,
        "harmless": harmless_agent,
        "lazy": lazy_agent,
    }[name]
    moves = jax.vmap(lambda k, g: act_all(pol, k, g))(keys, games)
    return moves, opp_state


class Transition(NamedTuple):
    feats: jax.Array    # [4, H*W*C] -- stored FLAT: a [.., 9, 9, 23] bf16
                        # array pays a ~10x TPU tile-padding expansion
                        # (last two dims pad to (16, 128)); flat rows pad
                        # ~1x.  Reshaped to [H, W, C] inside the model.
    move: jax.Array     # i32[4]
    logp: jax.Array     # f32[4]
    value: jax.Array    # f32[4]
    reward: jax.Array   # f32[4]
    alive: jax.Array    # bool[4] agent was alive when acting
    done: jax.Array     # bool    episode boundary after this step
    term: jax.Array     # bool[4] per-agent terminal after this step: the
                        #         board boundary OR this agent's own death.
                        #         GAE must truncate at a death even though
                        #         the board plays on -- the value head is
                        #         never trained on post-death observations
                        #         (alive masks them out of the loss), so
                        #         bootstrapping through V(dead obs) would
                        #         leak arbitrary network outputs into every
                        #         pre-death advantage.
    draw: jax.Array     # bool    that boundary ended with no winner
                        #         (step-cap timeout or mutual destruction)
    valid: jax.Array    # bool    False for the frozen post-terminal step that
                        #         auto-reset replaces (its feats/reward are
                        #         junk; excluded from loss and GAE bootstraps)


def collect_rollout(params, es: EnvState, cfg: PPOConfig):
    """Roll ``cfg.rollout_len`` steps of one board; vmap over the batch.

    Randomness flows from ``es.key`` (already distinct per board).
    Returns (final_env, Transition stacked on time, bootstrap values[4]).
    """

    def body(carry, _):
        es = carry
        k_act, k_next = jax.random.split(es.key)
        moves, logp, value, feats = _policy_all_agents(
            params, es.game, k_act, cfg.view_range
        )
        alive_before = ~es.game.agent_dead
        moves = jnp.where(es.game.agent_dead, 0, moves)
        es2 = env_step_auto_reset(
            es._replace(key=k_next), moves, team_mode=cfg.team_mode,
            max_steps=cfg.max_episode_steps,
            randomize_positions=cfg.randomize_positions,
        )

        died = alive_before & jnp.where(
            es.done, jnp.zeros((4,), bool), es2.game.agent_dead
        )
        if cfg.team_mode:
            # winner holds the TEAM id; every member of the winning team
            # that is still alive shares the +1.
            team = jnp.asarray(TEAM_OF)
            won = es2.done & ~es.done & (team == es2.winner) & alive_before
        else:
            won = (
                es2.done
                & ~es.done
                & (jnp.arange(4) == es2.winner)
                & alive_before
            )
        reward = won.astype(jnp.float32) - died.astype(jnp.float32)
        if cfg.draw_penalty:
            drew = (
                es2.done & ~es.done & (es2.winner < 0)
                & alive_before & ~es2.game.agent_dead
            )
            reward = reward - cfg.draw_penalty * drew.astype(jnp.float32)
        tr = Transition(
            feats=feats.reshape(AGENT_COUNT, -1),
            move=moves,
            logp=logp,
            value=value,
            reward=reward,
            alive=alive_before,
            done=es2.done & ~es.done,
            term=(es2.done & ~es.done) | died,
            draw=es2.done & ~es.done & (es2.winner < 0),
            valid=~es.done,
        )
        return es2, tr

    es_final, traj = lax.scan(body, es, None, length=cfg.rollout_len)
    _, _, boot_value, _ = _policy_all_agents(
        params, es_final.game, jax.random.PRNGKey(0)
    )
    return es_final, traj, boot_value


def collect_rollout_batch(params, es: EnvState, cfg: PPOConfig, opp_state=None,
                          time_major: bool = False, frozen_params=None):
    """``collect_rollout`` over the whole boards batch at once.

    Same semantics as ``jax.vmap(collect_rollout)`` (returns [B, T, ...]
    trajectories); the point is ``cfg.fused_env``: the env step runs as ONE
    fused Pallas kernel launch per step instead of per-board vmapped XLA
    ops, which are launch-bound at PPO batch sizes.

    ``time_major=True`` returns the trajectory as the scan produced it
    ([T, B, ...]) instead of transposing to [B, T, ...].  The transpose is
    not free: at batch 4096 x rollout 64 the feats buffer is ~5 GB, and
    the layout copy (plus its reshape temp downstream) tipped the train
    step over HBM.  ``ppo_train_step`` consumes the time-major layout
    directly; the [B, T] default remains for API compatibility.

    With ``cfg.opponent`` set, slots outside ``cfg.learner_slots`` act via
    the opponent policy; the trajectory (and thus the loss) carries ONLY the
    learner slots ([B, T, L, ...]), and a 4th element (the opponent FSM
    state, reset alongside auto-reset boards) is returned.

    ``cfg.opponent in ("frozen", "frozen+simple")`` drives opponent slots
    with a FROZEN net (``frozen_params``, sampled like the learner but
    never stored/trained) -- the generational self-improvement mode; with
    "frozen+simple" the non-frozen non-learner slots stay SimpleAgent
    (in-kernel under ``fused_env``).
    """
    from ..env.environment import env_step_auto_reset_batch

    slots = tuple(cfg.learner_slots) if cfg.opponent else tuple(
        range(AGENT_COUNT)
    )
    sl = list(slots)
    frozen_mode = cfg.opponent in ("frozen", "frozen+simple")
    if frozen_mode:
        assert frozen_params is not None, (
            f"opponent={cfg.opponent!r} needs frozen_params"
        )
        frozen = tuple(cfg.frozen_slots) or tuple(
            s for s in range(AGENT_COUNT) if s not in slots
        )
        assert not (set(frozen) & set(slots)), (frozen, slots)
    else:
        frozen = ()
    scripted = tuple(
        s for s in range(AGENT_COUNT)
        if s not in slots and s not in frozen
    ) if cfg.opponent else ()
    if cfg.opponent == "frozen":
        assert not scripted, (
            "opponent='frozen' leaves slots with no policy; use "
            "'frozen+simple' or widen frozen_slots/learner_slots"
        )
    # The scripted remainder of a frozen mixture is always SimpleAgent.
    scripted_name = (
        "simple" if cfg.opponent == "frozen+simple" else cfg.opponent
    )

    def body(carry, _):
        es, opp = carry
        if cfg.opponent:
            nk = 4 if frozen_mode else 3
            ks = jax.vmap(lambda k: jax.random.split(k, nk))(es.key)
            k_act, k_opp, k_next = ks[:, 0], ks[:, 1], ks[:, 2]
            k_frz = ks[:, 3] if frozen_mode else None
        else:
            # Bit-identical key flow to collect_rollout (the vmapped path).
            ks = jax.vmap(jax.random.split)(es.key)
            k_act, k_next = ks[:, 0], ks[:, 1]
            k_opp = None
        moves_l, logp, value, feats = jax.vmap(
            lambda k, g: _policy_slots(params, g, k, slots, cfg.view_range)
        )(k_act, es.game)
        if frozen_mode:
            # Frozen-net opponents: sampled exactly like the learner but
            # with stop-grad params and nothing stored.
            moves_f = jax.vmap(
                lambda k, g: _policy_slots(
                    frozen_params, g, k, frozen, cfg.view_range)[0]
            )(k_frz, es.game)
        alive_before = ~es.game.agent_dead
        if cfg.fused_env and scripted and scripted_name == "simple":
            # Mixed-control fused step: the SimpleAgent opponents run
            # INSIDE the kernel (the XLA FSM pass was the rollout
            # bottleneck); only the net lanes are injected.
            from ..env.environment import env_step_auto_reset_batch_fsm

            inj = slots + frozen
            moves = jnp.zeros_like(es.game.agent_x)
            for i, s in enumerate(slots):
                moves = moves.at[:, s].set(moves_l[:, i])
            for i, s in enumerate(frozen):
                moves = moves.at[:, s].set(moves_f[:, i])
            moves = jnp.where(es.game.agent_dead, 0, moves)
            seed = jax.random.randint(
                k_opp[0], (), 0, jnp.iinfo(jnp.int32).max, I32
            )
            es2, opp = env_step_auto_reset_batch_fsm(
                es._replace(key=k_next), moves, opp, inj, seed,
                team_mode=cfg.team_mode,
                max_steps=cfg.max_episode_steps,
                randomize_positions=cfg.randomize_positions,
            )
        else:
            if scripted:
                moves, opp = _opponent_moves_batch(
                    scripted_name, k_opp, es.game, opp
                )
            else:
                moves = jnp.zeros_like(es.game.agent_x)
            if cfg.opponent:
                for i, s in enumerate(slots):
                    moves = moves.at[:, s].set(moves_l[:, i])
                for i, s in enumerate(frozen):
                    moves = moves.at[:, s].set(moves_f[:, i])
            else:
                moves = moves_l
            moves = jnp.where(es.game.agent_dead, 0, moves)
            es2 = env_step_auto_reset_batch(
                es._replace(key=k_next), moves,
                team_mode=cfg.team_mode, fused=cfg.fused_env,
                max_steps=cfg.max_episode_steps,
                randomize_positions=cfg.randomize_positions,
            )
        if scripted and scripted_name == "simple":
            # A board that auto-reset starts its opponents from fresh FSMs.
            fresh = opponent_state_init(es.done.shape[0], cfg)
            opp = jax.tree.map(
                lambda f, o: jnp.where(
                    es.done.reshape((-1,) + (1,) * (o.ndim - 1)), f, o
                ),
                fresh, opp,
            )
        died = alive_before & jnp.where(
            es.done[:, None], False, es2.game.agent_dead
        )
        new_done = (es2.done & ~es.done)[:, None]
        if cfg.team_mode:
            team = jnp.asarray(TEAM_OF)[None]
        else:
            team = jnp.arange(AGENT_COUNT)[None]
        won = new_done & (team == es2.winner[:, None]) & alive_before
        reward = won.astype(jnp.float32) - died.astype(jnp.float32)
        if cfg.draw_penalty:
            drew = (
                new_done & (es2.winner[:, None] < 0)
                & alive_before & ~es2.game.agent_dead
            )
            reward = reward - cfg.draw_penalty * drew.astype(jnp.float32)
        tr = Transition(
            feats=feats.reshape(feats.shape[0], len(slots), -1),
            move=moves[:, sl],
            logp=logp,
            value=value,
            reward=reward[:, sl],
            alive=alive_before[:, sl],
            done=es2.done & ~es.done,
            term=(new_done | died)[:, sl],
            draw=es2.done & ~es.done & (es2.winner < 0),
            valid=~es.done,
        )
        return (es2, opp), tr

    (es_final, opp_final), traj = lax.scan(
        body, (es, opp_state), None, length=cfg.rollout_len
    )
    if not time_major:
        # [T, B, ...] -> [B, T, ...] to match the vmapped collect layout.
        traj = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), traj)
    _, _, boot_value, _ = jax.vmap(
        lambda g: _policy_slots(params, g, jax.random.PRNGKey(0), slots,
                                cfg.view_range)
    )(es_final.game)
    if cfg.opponent:
        return es_final, traj, boot_value, opp_final
    return es_final, traj, boot_value


def compute_gae(traj: Transition, boot_value, cfg: PPOConfig):
    """GAE over the time axis ([T, 4] values/rewards).

    Truncation is per-agent (``term`` = board boundary OR own death), so
    a dying agent's recursion stops at its death transition instead of
    bootstrapping through value estimates of post-death observations the
    value head is never trained on.
    """

    def body(carry, tr):
        gae, next_value = carry
        nonterminal = 1.0 - tr.term.astype(jnp.float32)
        delta = tr.reward + cfg.gamma * next_value * nonterminal - tr.value
        gae = delta + cfg.gamma * cfg.lam * nonterminal * gae
        return (gae, tr.value), (gae, gae + tr.value)

    (_, _), (adv, ret) = lax.scan(
        body,
        (jnp.zeros_like(boot_value), boot_value),
        traj,
        reverse=True,
    )
    return adv, ret


def _ppo_loss(params, batch, cfg: PPOConfig):
    feats, move, old_logp, adv, ret, alive = batch
    view_w = 2 * cfg.view_range + 1
    logits, value = jax.vmap(
        lambda f: _MODEL.apply(params, f.reshape(view_w, view_w, -1))
    )(feats)
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, move[:, None], axis=1)[:, 0]
    ratio = jnp.exp(logp - old_logp)
    w = alive.astype(jnp.float32)
    wsum = w.sum() + 1e-8
    # Masked advantage normalization: junk (invalid/dead) entries must not
    # shift the statistics of the real ones.
    adv_mean = (adv * w).sum() / wsum
    adv_std = jnp.sqrt((jnp.square(adv - adv_mean) * w).sum() / wsum)
    adv_n = (adv - adv_mean) / (adv_std + 1e-8)
    unclipped = ratio * adv_n
    clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
    pg_loss = -(jnp.minimum(unclipped, clipped) * w).sum() / wsum
    v_loss = (jnp.square(value - ret) * w).sum() / wsum
    entropy = (
        -(jnp.exp(logp_all) * logp_all).sum(-1) * w
    ).sum() / wsum
    loss = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
    return loss, {
        "loss": loss,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": entropy,
    }


def ppo_update(ts: TrainState, flat_batch, cfg: PPOConfig):
    """Minibatched clipped-PPO epochs over a flat [N, ...] batch."""
    opt = _optimizer(cfg)
    n = flat_batch[0].shape[0]
    mb = n // cfg.minibatches

    def epoch(carry, _):
        params, opt_state, key = carry
        key, perm_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, n)

        def mini(carry, i):
            params, opt_state = carry
            if cfg.shuffle_minibatches:
                # Gather ONE minibatch by its permuted row indices instead
                # of materializing a shuffled copy of the whole batch --
                # the full-batch permutation gather kept a second copy of
                # the feats buffer live (~4 GB at batch 4096 x rollout 64)
                # and pushed the step program past HBM.  Row-contiguous
                # takes of [mb, F] slabs DMA fine (unlike the per-cell
                # gathers of the ego-crop lesson, docs/PERF.md).
                idx = lax.dynamic_slice_in_dim(perm, i * mb, mb)
                sl = tuple(jnp.take(x, idx, axis=0) for x in flat_batch)
            else:
                # Contiguous slabs: boards are iid, so for epochs=1 /
                # few-minibatch configs composition bias is negligible
                # and the gather disappears entirely.
                sl = tuple(
                    lax.dynamic_slice_in_dim(x, i * mb, mb, axis=0)
                    for x in flat_batch
                )
            (loss, metrics), grads = jax.value_and_grad(
                _ppo_loss, has_aux=True
            )(params, sl, cfg)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        (params, opt_state), metrics = lax.scan(
            mini, (params, opt_state), jnp.arange(cfg.minibatches)
        )
        return (params, opt_state, key), metrics

    (params, opt_state, key), metrics = lax.scan(
        epoch, (ts.params, ts.opt_state, ts.key), None, length=cfg.epochs
    )
    metrics = jax.tree.map(lambda x: x[-1, -1], metrics)
    return (
        ts._replace(
            params=params,
            opt_state=opt_state,
            key=key,
            update_count=ts.update_count + 1,
        ),
        metrics,
    )


def ppo_train_step(ts: TrainState, es_batch: EnvState, cfg: PPOConfig = PPOConfig(),
                   opp_state=None, frozen_params=None):
    """One full PPO iteration over a batched env: collect + GAE + update.

    ``es_batch`` has a leading boards axis (shard it over the mesh); the
    returned env continues from where the rollout stopped.  jit this whole
    function -- under a boards NamedSharding the only collective XLA inserts
    is the gradient/metric all-reduce.

    With ``cfg.opponent`` set the return gains a 4th element (the scripted
    opponents' FSM state — thread it back in, or pass None to start fresh).
    ``frozen_params`` feeds the "frozen"/"frozen+simple" opponent modes
    (generational self-improvement: gen-2 trains against a frozen gen-1).
    """
    opp_final = None
    # The batched collectors keep the scan's time-major [T, B, ...] layout:
    # GAE vmaps over the boards axis in place and the flatten below is then
    # a free reshape, instead of a ~5 GB transpose copy of the feats buffer
    # (at batch 4096 x rollout 64 that copy + its reshape temp OOM'd HBM).
    time_major = bool(cfg.opponent) or cfg.fused_env
    if cfg.opponent:
        if opp_state is None and cfg.opponent in ("simple", "frozen+simple"):
            opp_state = opponent_state_init(es_batch.done.shape[0], cfg)
        es_final, traj, boot, opp_final = collect_rollout_batch(
            ts.params, es_batch, cfg, opp_state, time_major=True,
            frozen_params=frozen_params,
        )
    elif cfg.fused_env:
        es_final, traj, boot = collect_rollout_batch(
            ts.params, es_batch, cfg, time_major=True
        )
    else:
        es_final, traj, boot = jax.vmap(
            lambda e: collect_rollout(ts.params, e, cfg)
        )(es_batch)
    if time_major:
        # traj leaves are [T, B, ...]; map GAE over B (axis 1), boot over
        # its boards axis 0, and keep outputs time-major ([T, B, L]).
        adv, ret = jax.vmap(
            lambda t, b: compute_gae(t, b, cfg),
            in_axes=(1, 0), out_axes=1,
        )(traj, boot)
    else:
        adv, ret = jax.vmap(lambda t, b: compute_gae(t, b, cfg))(traj, boot)

    # Flatten [B, T, 4, ...] (or time-major [T, B, 4, ...]) -> [B*T*4, ...];
    # rows are iid for the shuffled minibatch gather either way.
    def flat(x):
        return x.reshape((-1,) + x.shape[3:])

    flat_batch = (
        flat(traj.feats),
        flat(traj.move),
        flat(traj.logp),
        flat(adv),
        flat(ret),
        flat(traj.alive & traj.valid[:, :, None]),
    )
    ts, metrics = ppo_update(ts, flat_batch, cfg)
    metrics["reward_mean"] = traj.reward.sum() / jnp.maximum(
        traj.done.sum(), 1
    )
    metrics["episodes"] = traj.done.sum()
    metrics["draws"] = traj.draw.sum()
    if cfg.opponent:
        return ts, es_final, metrics, opp_final
    return ts, es_final, metrics
