"""Gym-style adapter: numpy in/out ``reset``/``step`` over the JAX env.

The reference replaced the slow Python/gym Pommerman backend with C++
(pomcpp README.md:4) and kept its own C++ API; everyone integrating with
standard RL tooling still speaks the gym protocol.  This adapter closes
that loop for this framework: a ``PommermanEnv`` holds a (batched)
``EnvState`` on device, steps it through the cellular engine under one
jitted closure, and exposes the gymnasium 5-tuple step API with per-agent
observation dicts shaped like classic Pommerman's (keys ``board``,
``bomb_life``, ``bomb_blast_strength``, ``position``, ``ammo``, ...).

No gym/gymnasium dependency: the protocol is duck-typed (``reset(seed=)``
-> ``(obs, info)``; ``step(actions)`` -> ``(obs, rewards, terminated,
truncated, info)``).

``classic_encoding=True`` emits python-pommerman's exact observation
conventions so existing agents port without a translation layer: the
0-13 Item scheme (our cell-class codes coincide 1:1 by design --
``CLASSIC_ITEM_TABLE`` is the pinned contract), ``position`` as
``(row, col)``, ``teammate``/``enemies`` as Item codes, classic's
inclusive ``blast_strength`` (classic 2 == pomcpp strength 1), float
timer planes, and ``step_count``/``game_type``/``bomb_moving_direction``.
Default (off) keeps the reference's conventions: ``position`` = (x, y)
with ``x`` the column (bboard.hpp:192), raw strength, int planes.

Deliberate residuals in classic mode (game RULES, not encoding --
translating them would change the simulated game away from the
reference): flame lifetime is pomcpp's 4 (classic 2), bomb timers count
from pomcpp's 10, and all four agents step simultaneously from one
``actions[4]`` array (no per-agent turn order).

Batched mode (``batch_size=N``) vectorizes everything: actions ``[N, 4]``,
rewards ``[N, 4]``, per-key observation arrays gain a leading batch axis,
and finished boards auto-reset on their next step (gymnasium vector-env
convention; rewards/terminated read 0/False on the reset step itself).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import AGENT_COUNT, BOARD_SIZE, NUM_MOVES
from ..core.state import I32
from .environment import TEAM_OF, env_reset, env_step, env_step_auto_reset
from .observation import DEFAULT_VIEW_RANGE, observe, observe_ego


# Classic python-pommerman item codes (pommerman/constants.py Item enum),
# pinned next to ours.  The plane decomposition was chosen so the CELL
# CLASS codes coincide 1:1 with the classic 0-13 scheme -- this table is
# the contract (tests/test_gym_adapter.py pins every pair), and
# ``classic_encoding=True`` relies on it to emit boards untranslated.
CLASSIC_ITEM_TABLE = {
    # name: (ours, classic)
    "Passage": (0, 0),
    "Rigid": (1, 1),
    "Wood": (2, 2),
    "Bomb": (3, 3),
    "Flames": (4, 4),
    "Fog": (5, 5),
    "ExtraBomb": (6, 6),
    "IncrRange": (7, 7),
    "Kick": (8, 8),
    "AgentDummy": (9, 9),
    "Agent0": (10, 10),
    "Agent1": (11, 11),
    "Agent2": (12, 12),
    "Agent3": (13, 13),
}

# Classic action codes (pommerman/constants.py Action enum) vs our move
# codes (core/constants.py M_*): also 1:1 -- Stop/Up/Down/Left/Right/Bomb
# = 0..5 with Up meaning row-1 == our y-1.
CLASSIC_ACTION_TABLE = {
    "Stop": (0, 0), "Up": (1, 1), "Down": (2, 2),
    "Left": (3, 3), "Right": (4, 4), "Bomb": (5, 5),
}

_CLASSIC_AGENT_DUMMY = 9
_CLASSIC_AGENT0 = 10
_CLASSIC_GAME_TYPE_FFA = 1
_CLASSIC_GAME_TYPE_TEAM = 2


def _obs_planes(game, fog: str, view_range: int, team_mode: bool,
                classic: bool = False):
    """Per-agent observation dicts (list of AGENT_COUNT PyTrees).

    ``classic=True`` switches to python-pommerman's conventions where they
    differ from the reference's: ``position`` becomes (row, col) == (y, x),
    ``teammate``/``enemies`` are Item codes (AgentDummy = 9 when absent),
    ``blast_strength``/``bomb_blast_strength`` include the bomb's own cell
    (classic default 2 == pomcpp strength 1), and ``step_count``/
    ``game_type`` are added.
    """

    def teammate(aid):
        return (aid + 2) % 4 if team_mode else -1

    def classic_extras(aid, position_xy, strength, bombs_strength_plane):
        """Rewrites shared by the fog and no-fog paths."""
        tm = teammate(aid)
        enemies = [a for a in range(AGENT_COUNT) if a != aid and a != tm]
        enemy_codes = [_CLASSIC_AGENT0 + e for e in enemies]
        while len(enemy_codes) < 3:  # team mode: pad like the classic env
            enemy_codes.append(_CLASSIC_AGENT_DUMMY)
        return dict(
            position=position_xy[::-1],  # (row, col) == (y, x)
            teammate=jnp.asarray(
                _CLASSIC_AGENT_DUMMY if tm < 0 else _CLASSIC_AGENT0 + tm,
                I32,
            ),
            enemies=jnp.asarray(enemy_codes, I32),
            blast_strength=strength + 1,
            bomb_blast_strength=jnp.where(
                bombs_strength_plane > 0, bombs_strength_plane + 1, 0
            ).astype(jnp.float32),
            step_count=game.timestep,
            game_type=jnp.asarray(
                _CLASSIC_GAME_TYPE_TEAM if team_mode
                else _CLASSIC_GAME_TYPE_FFA, I32,
            ),
        )

    if fog == "none":
        def one(aid):
            d = dict(
                board=game.board,
                bomb_life=game.bomb_timer,
                bomb_blast_strength=game.bomb_strength,
                flame_life=game.flame_timer,
                position=jnp.stack(
                    [game.agent_x[aid], game.agent_y[aid]]
                ).astype(I32),
                ammo=game.agent_max_bombs[aid] - game.agent_bomb_count[aid],
                blast_strength=game.agent_strength[aid],
                can_kick=game.agent_can_kick[aid],
                alive=~game.agent_dead,
                teammate=jnp.asarray(teammate(aid), I32),
            )
            if classic:
                d.update(classic_extras(
                    aid, d["position"], game.agent_strength[aid],
                    game.bomb_strength,
                ))
                d["bomb_moving_direction"] = game.bomb_dir.astype(
                    jnp.float32
                )
            return d
    else:
        obs_fn = observe if fog == "fog" else observe_ego

        def one(aid):
            o = obs_fn(game, aid, view_range=view_range,
                       teammate=teammate(aid))
            d = dict(
                board=o.board,
                bomb_life=o.bomb_timer,
                bomb_blast_strength=o.bomb_strength,
                flame_life=o.flame_timer,
                position=o.position,
                ammo=o.max_bombs - o.bomb_count,
                blast_strength=o.strength,
                can_kick=o.can_kick,
                alive=o.alive,
                teammate=o.teammate,
            )
            if classic:
                d.update(classic_extras(
                    aid, o.position, o.strength, o.bomb_strength,
                ))
                d["bomb_moving_direction"] = o.bomb_dir.astype(jnp.float32)
            return d

    return [one(aid) for aid in range(AGENT_COUNT)]


class PommermanEnv:
    """Gym-protocol front end over the batched cellular engine.

    Replaces the reference's ``Environment`` game loop (environment.cpp:
    48-215) for users integrating with python RL tooling.  ``fog`` selects
    the observation: ``"none"`` (full state, the reference's view),
    ``"fog"`` (classic 9x9 visibility masking), or ``"ego"`` (egocentric
    crop, the learner's input layout).

    Rewards (per agent): +1 on the step the agent's side wins, -1 on the
    step the agent dies, 0 otherwise -- the learner's scheme
    (learner/ppo.py).  ``terminated``/``truncated`` are per board;
    ``truncated`` marks draws (including the ``max_episode_steps`` cap).
    """

    metadata = {"render_modes": ["ansi"]}

    def __init__(
        self,
        batch_size: Optional[int] = None,
        fog: str = "none",
        view_range: int = DEFAULT_VIEW_RANGE,
        team_mode: bool = False,
        max_episode_steps: int = 800,
        auto_reset: bool = True,
        classic_encoding: bool = False,
    ):
        assert fog in ("none", "fog", "ego"), fog
        self.batch_size = batch_size
        self.fog = fog
        self.classic_encoding = classic_encoding
        self.view_range = view_range
        self.team_mode = team_mode
        self.max_episode_steps = max_episode_steps
        # Auto-reset is a batched-vector-env convention; the single env
        # follows gym's "call reset() yourself after done" contract.
        self.auto_reset = auto_reset and batch_size is not None
        self.n_agents = AGENT_COUNT
        self.n_actions = NUM_MOVES  # 6: idle/up/down/left/right/bomb
        self.board_shape = (BOARD_SIZE, BOARD_SIZE)
        self._es = None

        b = batch_size
        step_one = env_step_auto_reset if self.auto_reset else env_step
        team_arr = jnp.asarray(TEAM_OF)
        agent_ids = jnp.arange(AGENT_COUNT)

        def _reset(key):
            if b is None:
                return env_reset(key, engine="cellular")
            return jax.vmap(
                lambda k: env_reset(k, engine="cellular")
            )(jax.random.split(key, b))

        def _step(es, actions):
            def one(e, mv):
                dead_before = e.game.agent_dead | e.done
                e2 = step_one(
                    e, mv, team_mode=team_mode,
                    max_steps=max_episode_steps,
                )
                died = e2.game.agent_dead & ~dead_before
                # Team mode: ``winner`` holds the TEAM id (0/1).
                win_mask = (
                    team_arr == e2.winner if team_mode
                    else agent_ids == e2.winner
                )
                won = (
                    (e2.done & ~e.done) & (e2.winner >= 0)
                    & win_mask & ~dead_before
                )
                reward = won.astype(jnp.float32) - died.astype(jnp.float32)
                return e2, reward

            if b is None:
                return one(es, actions)
            return jax.vmap(one)(es, actions)

        classic = classic_encoding

        def _observe(es):
            if b is None:
                return _obs_planes(es.game, fog, view_range, team_mode,
                                   classic)
            return jax.vmap(
                lambda g: _obs_planes(g, fog, view_range, team_mode, classic)
            )(es.game)

        self._reset_fn = jax.jit(_reset)
        self._step_fn = jax.jit(_step)
        self._observe_fn = jax.jit(_observe)

    # -- gym protocol ------------------------------------------------------

    def reset(self, seed: int = 0):
        self._es = self._reset_fn(jax.random.PRNGKey(seed))
        return self._np_obs(), {"winner": self._np(self._es.winner)}

    def step(self, actions):
        assert self._es is not None, "call reset() first"
        actions = jnp.asarray(np.asarray(actions), I32)
        expect = (4,) if self.batch_size is None else (self.batch_size, 4)
        assert actions.shape == expect, (actions.shape, expect)
        self._es, reward = self._step_fn(self._es, actions)
        terminated = self._es.done & ~self._es.is_draw
        truncated = self._es.done & self._es.is_draw
        info = {
            "winner": self._np(self._es.winner),
            "alive": self._np(~self._es.game.agent_dead),
            "timestep": self._np(self._es.game.timestep),
        }
        return (
            self._np_obs(),
            self._np(reward),
            self._np(terminated),
            self._np(truncated),
            info,
        )

    def render(self) -> str:
        from ..engine.cellular import to_state
        from ..render.ascii import render_state

        game = self._es.game
        if self.batch_size is not None:
            game = jax.tree.map(lambda x: x[0], game)
        return render_state(to_state(game), color=False)

    def close(self) -> None:
        self._es = None

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _np(x):
        return np.asarray(jax.device_get(x))

    def _np_obs(self):
        obs = jax.device_get(self._observe_fn(self._es))
        out = []
        plane_keys = ["board", "bomb_life", "bomb_blast_strength",
                      "flame_life"]
        if self.classic_encoding:
            plane_keys.append("bomb_moving_direction")
        for agent_obs in obs:
            d = {k: np.asarray(v) for k, v in agent_obs.items()}
            for k in plane_keys:
                d[k] = d[k].reshape(d[k].shape[:-1] + self._plane_shape())
            if self.classic_encoding:
                # python-pommerman serves the timer planes as floats.
                for k in ("bomb_life", "bomb_blast_strength", "flame_life",
                          "bomb_moving_direction"):
                    d[k] = d[k].astype(np.float64)
                d["position"] = tuple(
                    int(p) for p in d["position"]
                ) if self.batch_size is None else d["position"]
                if self.batch_size is None:
                    # Classic 'alive' is the value list of living agents.
                    d["alive"] = [
                        _CLASSIC_AGENT0 + i
                        for i, a in enumerate(d["alive"]) if a
                    ]
                    d["enemies"] = [int(e) for e in d["enemies"]]
                    d["teammate"] = int(d["teammate"])
            out.append(d)
        return out

    def _plane_shape(self):
        if self.fog == "ego":
            w = 2 * self.view_range + 1
            return (w, w)
        return self.board_shape
