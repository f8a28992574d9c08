"""Game orchestration as pure functions (reference: Environment, L4).

The reference ``Environment`` (pomcpp src/bboard/environment.cpp:48-215,
include/bboard.hpp:541-644) is a stateful game-loop object: it owns the
State, asks each agent for a move (optionally on threads), calls
``bboard::Step``, advances ``timeStep`` and latches win/draw flags.

TPU-native redesign: the environment is a PyTree (``EnvState``) and three
pure functions --

* ``env_reset(key)``     -- fresh game from an on-device random board
* ``env_step(es, mv)``   -- one step + terminal detection, frozen when done
* ``env_step_auto_reset``-- same, but finished games restart from a split key

All are jittable and vmappable; a batch of games is just a leading axis.
The reference's per-agent actor threads (CollectMovesAsync,
environment.cpp:95-116) have no TPU analogue: policies are evaluated as a
vmapped pure function over (board, agent), and the 100 ms "competitive
pause" is dropped as wall-clock semantics that are meaningless on-device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.board_gen import init_state_np, random_cell_state, random_state
from ..core.constants import AGENT_COUNT
from ..core.state import I32, State
from ..engine.cellular import CellState, cellular_step
from ..engine.step import step


class EnvState(NamedTuple):
    game: State
    done: jax.Array     # bool
    winner: jax.Array   # i32, agent id or -1 (none / draw)
    is_draw: jax.Array  # bool
    key: jax.Array      # PRNG key consumed by auto-reset


# A policy maps (key, game_state, agent_id) -> move code.  Policies see the
# full state, like the reference's ``Agent::act(const State*)``
# (bboard.hpp:517-533); fog-of-war wraps the state before the policy.
Policy = Callable[[jax.Array, State, jax.Array], jax.Array]


def _step_fn(game):
    """Dispatch on the state representation: exact queues vs cellular planes."""
    return cellular_step if isinstance(game, CellState) else step


def _fresh(key: jax.Array, engine: str = "exact",
           randomize_positions: bool = False) -> EnvState:
    reset_key, next_key = jax.random.split(key)
    make = random_cell_state if engine == "cellular" else random_state
    return EnvState(
        game=make(reset_key, randomize_positions=randomize_positions),
        done=jnp.zeros((), bool),
        winner=jnp.full((), -1, I32),
        is_draw=jnp.zeros((), bool),
        key=next_key,
    )


def env_reset(key: jax.Array, engine: str = "exact",
              randomize_positions: bool = False) -> EnvState:
    """Fresh single game; vmap over keys for a batch.

    ``engine="cellular"`` uses the plane-encoded production state
    (engine/cellular.py) -- the TPU fast path; ``"exact"`` uses the
    queue-encoded conformance state (engine/step.py).

    ``randomize_positions`` permutes which agent sits in which corner,
    drawn from the key -- the reference ``Environment::MakeGame``'s
    optional ``std::random_shuffle`` of corner assignment
    (environment.cpp:53-66).  Off by default (reference default; parity
    and the ported tests rely on fixed seats).
    """
    return _fresh(key, engine, randomize_positions)


def env_reset_np(seed: int = 0x1337, **kw) -> EnvState:
    """Fresh game on the reference's exact board for ``seed`` (host-side)."""
    return EnvState(
        game=init_state_np(seed, **kw),
        done=jnp.zeros((), bool),
        winner=jnp.full((), -1, I32),
        is_draw=jnp.zeros((), bool),
        key=jax.random.PRNGKey(seed),
    )


# Classic Pommerman 2v2 teams: agents {0, 2} vs {1, 3}.
TEAM_OF = (0, 1, 0, 1)


def _detect_terminal(es: EnvState, team_mode: bool = False,
                     max_steps: int = 0) -> EnvState:
    """Win/draw latching after a step (environment.cpp:152-168).

    FFA: last agent standing wins; zero alive is a draw.  Team mode (the
    reference declares ``teamWon`` but never implements it,
    bboard.hpp:556): a team wins when every opponent is dead; ``winner``
    then holds the TEAM id (0 or 1); both teams wiped out is a draw.

    ``max_steps > 0`` additionally ends the game as a draw once
    ``timestep`` reaches it -- the official Pommerman 800-step rule.  The
    reference never implements a cap (its demo loops bound steps caller-
    side), so the default 0 preserves reference semantics; training uses
    the cap so stalemated boards (e.g. two dodging SimpleAgents) recycle
    instead of freezing forever.
    """
    if team_mode:
        team = jnp.asarray(TEAM_OF)
        alive = ~es.game.agent_dead
        t0_alive = jnp.any(alive & (team == 0))
        t1_alive = jnp.any(alive & (team == 1))
        won = t0_alive ^ t1_alive
        survivor = jnp.where(t0_alive, 0, 1).astype(I32)
        draw = ~t0_alive & ~t1_alive
    else:
        alive_n = es.game.alive_count
        won = alive_n == 1
        # With exactly one survivor any selection rule agrees.
        survivor = jnp.argmax(~es.game.agent_dead).astype(I32)
        draw = alive_n == 0
    if max_steps:
        draw = draw | (~won & (es.game.timestep >= max_steps))
    return es._replace(
        done=es.done | won | draw,
        winner=jnp.where(won & ~es.done, survivor, es.winner),
        is_draw=es.is_draw | (draw & ~es.done),
    )


def env_step(es: EnvState, moves, team_mode: bool = False,
             max_steps: int = 0) -> EnvState:
    """One simultaneous step + timeStep advance + terminal detection.

    Like ``Environment::Step`` (environment.cpp:123-168), a finished game is
    frozen: stepping it is a no-op.
    """
    game = _step_fn(es.game)(es.game, moves)
    game = game._replace(timestep=game.timestep + 1)
    nxt = _detect_terminal(es._replace(game=game), team_mode, max_steps)
    return jax.tree.map(lambda a, b: jnp.where(es.done, a, b), es, nxt)


def env_step_auto_reset(es: EnvState, moves, team_mode: bool = False,
                        max_steps: int = 0,
                        randomize_positions: bool = False) -> EnvState:
    """``env_step``, but a game that finished restarts on its next step.

    The episode outcome is readable for exactly one step (the step that set
    ``done``); standard batched-RL semantics.  ``randomize_positions``
    applies to the restarted games (see ``env_reset``).
    """
    engine = "cellular" if isinstance(es.game, CellState) else "exact"
    fresh = _fresh(es.key, engine, randomize_positions)
    stepped = env_step(es, moves, team_mode, max_steps)
    return jax.tree.map(lambda f, s: jnp.where(es.done, f, s), fresh, stepped)


def env_step_auto_reset_batch(
    es: EnvState, moves, team_mode: bool = False, fused: bool = False,
    max_steps: int = 0, randomize_positions: bool = False
) -> EnvState:
    """Batched ``env_step_auto_reset`` over a leading boards axis.

    Semantically identical to ``jax.vmap(env_step_auto_reset)``; the win is
    ``fused=True``, which steps the whole batch through the fused Pallas
    kernel (engine/pallas_step.py) in ONE launch instead of ~600 small XLA
    ops per step -- the launch-bound regime that caps vmapped PPO rollouts
    (batch must divide into 256-board blocks).  CellState only.
    """
    if fused:
        from ..engine.pallas_step import pallas_step

        assert isinstance(es.game, CellState), (
            "fused=True steps the Pallas kernel, which is CellState-only; "
            "build the batch with env_reset(key, engine='cellular')"
        )
        game = pallas_step(es.game, moves)
        game = game._replace(timestep=game.timestep + 1)
        return _merge_done_and_reset(es, game, team_mode, max_steps,
                                     randomize_positions)
    return jax.vmap(
        lambda e, m: env_step_auto_reset(e, m, team_mode, max_steps,
                                         randomize_positions)
    )(es, moves)


def _merge_done_and_reset(es: EnvState, game, team_mode: bool,
                          max_steps: int,
                          randomize_positions: bool = False) -> EnvState:
    """Batched done-latch + auto-reset merge shared by the fused paths.

    ``game`` is the already-stepped batch (timestep advanced).  Boards
    that were already done keep their frozen terminal state, boards that
    just finished latch their result, and done boards are then replaced
    by fresh games keyed from ``es.key``.
    """
    nxt = jax.vmap(lambda e: _detect_terminal(e, team_mode, max_steps))(
        es._replace(game=game)
    )

    def _bcast(d, a):
        return d.reshape((-1,) + (1,) * (a.ndim - 1))

    stepped = jax.tree.map(
        lambda a, b: jnp.where(_bcast(es.done, a), a, b), es, nxt
    )
    fresh = jax.vmap(
        lambda k: _fresh(k, "cellular", randomize_positions)
    )(es.key)
    return jax.tree.map(
        lambda f, s: jnp.where(_bcast(es.done, f), f, s), fresh, stepped
    )


def env_step_auto_reset_batch_fsm(
    es: EnvState, learner_moves, fsm_state, learner_slots: tuple,
    seed, team_mode: bool = False, max_steps: int = 0,
    interpret: bool = False, rand_moves=None,
    randomize_positions: bool = False,
):
    """Fused mixed-control step: in-kernel SimpleAgent opponents + injected
    learner moves, ONE Pallas launch for the whole batch.

    Same env semantics as ``env_step_auto_reset_batch`` but the non-learner
    slots act via the in-kernel FSM (engine/pallas_fsm.py) instead of a
    host-side policy pass -- the XLA FSM opponents were the PPO
    curriculum's rollout bottleneck.  ``fsm_state`` is the kernel 10-tuple
    (``simple_fsm_state_init``); ``seed`` (i32) feeds the kernel PRNG for
    the FSM's rand draws and must differ per step.  ``rand_moves``
    ([B, 4], tests only) supplies those draws explicitly instead
    (interpret-compatible; learner lanes of the merged input are the
    override moves either way).  Returns ``(EnvState, fsm_state')``;
    the caller owns resetting ``fsm_state`` rows of finished boards.
    """
    from ..engine.pallas_step import pallas_rollout_chunk

    slots = tuple(learner_slots)
    mv = learner_moves if rand_moves is None else jnp.where(
        jnp.isin(jnp.arange(AGENT_COUNT), jnp.asarray(slots)),
        learner_moves, rand_moves,
    )
    game, fsm2 = pallas_rollout_chunk(
        es.game, seed, steps=1, policy="simple", moves=mv[None],
        auto_reset=False, fsm_state=fsm_state, inject_slots=slots,
        prng_rand=rand_moves is None, interpret=interpret,
    )
    return _merge_done_and_reset(
        es, game, team_mode, max_steps, randomize_positions
    ), fsm2


def act_all(policy: Policy, key: jax.Array, game: State) -> jax.Array:
    """Evaluate one policy for all four agents -> i32[4] moves.

    Dead agents get IDLE (the reference leaves their move slots uninitialized
    -- environment.cpp:127-147 -- but the step engine never reads moves of
    dead agents, so IDLE is observationally identical).
    """
    keys = jax.random.split(key, AGENT_COUNT)
    ids = jnp.arange(AGENT_COUNT, dtype=I32)
    moves = jax.vmap(policy, in_axes=(0, None, 0))(keys, game, ids)
    return jnp.where(game.agent_dead, 0, moves).astype(I32)


def rollout(es: EnvState, policy: Policy, n_steps: int, auto_reset: bool = True,
            team_mode: bool = False, max_steps: int = 0):
    """Run ``n_steps`` with ``policy`` controlling all agents via lax.scan.

    Returns ``(final_env, metrics)`` where metrics are per-step scalars
    (done flags, winners, alive counts) stacked over time.  vmap over a
    leading batch axis of ``es`` for lockstep parallel games.
    ``team_mode``/``max_steps`` forward to the stepper's terminal
    detection (2v2 outcomes; step-cap draws for stalemate-prone
    policies).
    """
    base = env_step_auto_reset if auto_reset else env_step

    def stepper(e, m):
        return base(e, m, team_mode=team_mode, max_steps=max_steps)

    def body(carry, _):
        es = carry
        act_key, next_key = jax.random.split(es.key)
        es = es._replace(key=next_key)
        moves = act_all(policy, act_key, es.game)
        es = stepper(es, moves)
        return es, {
            "done": es.done,
            "winner": es.winner,
            "alive": es.game.alive_count,
        }

    return lax.scan(body, es, None, length=n_steps)


def rollout_stateful(
    es: EnvState,
    act_fn,
    policy_state,
    n_steps: int,
    auto_reset: bool = True,
    reset_policy_state=None,
    joint: bool = False,
    team_mode: bool = False,
    max_steps: int = 0,
):
    """Rollout for stateful policies (e.g. the SimpleAgent FSM).

    ``act_fn(key, game, agent_id, pstate_i) -> (move, pstate_i')`` where
    ``policy_state`` is a PyTree stacked over the 4 agents on its leading
    axis.  When ``auto_reset`` fires and ``reset_policy_state`` is given,
    the per-board policy state is replaced by it on episode restart.

    ``joint=True`` switches the protocol to
    ``act_fn(key, game, pstate) -> (moves_i32[4], pstate')`` -- one call for
    all four agents, letting the policy share agent-independent work (e.g.
    the SimpleAgent danger map).  ``team_mode``/``max_steps`` forward to
    the stepper's terminal detection.
    """
    base = env_step_auto_reset if auto_reset else env_step

    def stepper(e, m):
        return base(e, m, team_mode=team_mode, max_steps=max_steps)

    def body(carry, _):
        es, ps = carry
        act_key, next_key = jax.random.split(es.key)
        if joint:
            moves, ps_new = act_fn(act_key, es.game, ps)
        else:
            keys = jax.random.split(act_key, AGENT_COUNT)
            ids = jnp.arange(AGENT_COUNT, dtype=I32)
            moves, ps_new = jax.vmap(act_fn, in_axes=(0, None, 0, 0))(
                keys, es.game, ids, ps
            )
        moves = jnp.where(es.game.agent_dead, 0, moves).astype(I32)
        if auto_reset and reset_policy_state is not None:
            ps_new = jax.tree.map(
                lambda f, s: jnp.where(es.done, f, s), reset_policy_state, ps_new
            )
        es = stepper(es._replace(key=next_key), moves)
        return (es, ps_new), {
            "done": es.done,
            "winner": es.winner,
            "alive": es.game.alive_count,
        }

    (es, policy_state), metrics = lax.scan(
        body, (es, policy_state), None, length=n_steps
    )
    return es, policy_state, metrics
