"""Gym-protocol adapter: shapes, reward semantics, auto-reset, rendering."""

import numpy as np
import pytest

from pomcpp_tpu.core.constants import BOARD_SIZE, M_IDLE
from pomcpp_tpu.env.gym_adapter import PommermanEnv

OBS_KEYS = {
    "board", "bomb_life", "bomb_blast_strength", "flame_life", "position",
    "ammo", "blast_strength", "can_kick", "alive", "teammate",
}


def test_single_env_protocol():
    env = PommermanEnv()
    obs, info = env.reset(seed=0)
    assert len(obs) == 4
    assert set(obs[0]) == OBS_KEYS
    assert obs[0]["board"].shape == (BOARD_SIZE, BOARD_SIZE)
    assert obs[2]["position"].shape == (2,)
    assert bool(obs[0]["alive"].all())
    assert int(obs[0]["teammate"]) == -1

    obs, rew, term, trunc, info = env.step(np.zeros(4, np.int64))
    assert rew.shape == (4,) and not rew.any()
    assert not term and not trunc
    assert int(info["timestep"]) == 1
    txt = env.render()
    assert isinstance(txt, str) and len(txt.splitlines()) >= BOARD_SIZE


def test_single_env_runs_to_termination():
    env = PommermanEnv(max_episode_steps=10)
    env.reset(seed=1)
    for t in range(10):
        obs, rew, term, trunc, info = env.step(np.zeros(4, np.int64))
        if term or trunc:
            break
    assert trunc  # idle agents -> step-cap draw
    assert int(info["timestep"]) == 10
    # Frozen after done (no auto-reset in single mode): stepping is a no-op.
    obs2, rew2, term2, trunc2, _ = env.step(np.zeros(4, np.int64))
    assert trunc2 and not rew2.any()


def test_batched_env_shapes_and_auto_reset():
    B = 8
    env = PommermanEnv(batch_size=B, max_episode_steps=6)
    obs, _ = env.reset(seed=2)
    assert obs[0]["board"].shape == (B, BOARD_SIZE, BOARD_SIZE)
    assert obs[0]["position"].shape == (B, 2)
    for t in range(6):
        obs, rew, term, trunc, info = env.step(
            np.zeros((B, 4), np.int64)
        )
    assert rew.shape == (B, 4)
    assert trunc.all()  # all boards hit the cap simultaneously
    # Next step auto-resets: outcome flags clear and the fresh (unstepped)
    # episode state becomes visible -- timestep 0, everyone alive.
    obs, rew, term, trunc, info = env.step(np.zeros((B, 4), np.int64))
    assert not term.any() and not trunc.any()
    assert (info["timestep"] == 0).all()
    assert info["alive"].all()


def test_fog_and_ego_observations():
    fogged = PommermanEnv(fog="fog", view_range=2)
    obs, _ = fogged.reset(seed=3)
    assert obs[0]["board"].shape == (BOARD_SIZE, BOARD_SIZE)
    from pomcpp_tpu.core.constants import C_FOG

    assert (obs[0]["board"] == C_FOG).any()  # far cells are fogged

    ego = PommermanEnv(fog="ego", view_range=4)
    obs, _ = ego.reset(seed=3)
    assert obs[1]["board"].shape == (9, 9)


def test_team_mode_teammate_ids():
    env = PommermanEnv(team_mode=True)
    obs, _ = env.reset(seed=4)
    assert [int(o["teammate"]) for o in obs] == [2, 3, 0, 1]


def test_determinism():
    a = PommermanEnv()
    b = PommermanEnv()
    oa, _ = a.reset(seed=7)
    ob, _ = b.reset(seed=7)
    np.testing.assert_array_equal(oa[0]["board"], ob[0]["board"])
    acts = np.array([1, 4, 2, 3])
    ra = a.step(acts)
    rb = b.step(acts)
    np.testing.assert_array_equal(ra[0][0]["board"], rb[0][0]["board"])
    np.testing.assert_array_equal(ra[1], rb[1])


def test_action_shape_validation():
    env = PommermanEnv(batch_size=4)
    env.reset(seed=0)
    with pytest.raises(AssertionError):
        env.step(np.zeros(4, np.int64))


# --- classic python-pommerman compatibility mode (VERDICT r2 item 6) ---------


def test_classic_item_and_action_tables_pin_every_code():
    """The translation contract: every classic Item/Action code pair is
    pinned against our constants.  Our cell-class codes were chosen to
    coincide with python-pommerman's 0-13 scheme; this test makes that a
    guarantee instead of a coincidence."""
    from pomcpp_tpu.core import constants as C
    from pomcpp_tpu.env.gym_adapter import (
        CLASSIC_ACTION_TABLE,
        CLASSIC_ITEM_TABLE,
    )

    ours_by_name = {
        "Passage": C.C_PASSAGE, "Rigid": C.C_RIGID, "Wood": C.C_WOOD,
        "Bomb": C.C_BOMB, "Flames": C.C_FLAME, "Fog": C.C_FOG,
        "ExtraBomb": C.C_EXTRABOMB, "IncrRange": C.C_INCRRANGE,
        "Kick": C.C_KICK, "AgentDummy": 9,
        "Agent0": C.C_AGENT0, "Agent1": C.C_AGENT0 + 1,
        "Agent2": C.C_AGENT0 + 2, "Agent3": C.C_AGENT0 + 3,
    }
    # python-pommerman constants.Item values.
    classic_by_name = {
        "Passage": 0, "Rigid": 1, "Wood": 2, "Bomb": 3, "Flames": 4,
        "Fog": 5, "ExtraBomb": 6, "IncrRange": 7, "Kick": 8,
        "AgentDummy": 9, "Agent0": 10, "Agent1": 11, "Agent2": 12,
        "Agent3": 13,
    }
    assert set(CLASSIC_ITEM_TABLE) == set(classic_by_name)
    for name, (ours, classic) in CLASSIC_ITEM_TABLE.items():
        assert ours == ours_by_name[name], name
        assert classic == classic_by_name[name], name
        assert ours == classic, f"{name}: board needs translation"

    moves_by_name = {
        "Stop": C.M_IDLE, "Up": C.M_UP, "Down": C.M_DOWN,
        "Left": C.M_LEFT, "Right": C.M_RIGHT, "Bomb": C.M_BOMB,
    }
    for name, (ours, classic) in CLASSIC_ACTION_TABLE.items():
        assert ours == moves_by_name[name] == classic, name


def test_classic_encoding_single_env():
    env = PommermanEnv(classic_encoding=True)
    obs, info = env.reset(seed=3)
    o0 = obs[0]
    # Classic-only keys present.
    for k in ("enemies", "step_count", "game_type",
              "bomb_moving_direction"):
        assert k in o0, k
    # (row, col) position: agent 0 starts in corner (x=0, y=0) -> (0, 0);
    # agent 1 at (x=10, y=0) -> classic (row=0, col=10).
    assert o0["position"] == (0, 0)
    assert obs[1]["position"] == (0, 10)
    assert obs[2]["position"] == (10, 10)
    # FFA: no teammate (AgentDummy), three enemies as Item codes.
    assert int(o0["teammate"]) == 9
    assert o0["enemies"] == [11, 12, 13]
    assert o0["alive"] == [10, 11, 12, 13]
    # Classic inclusive blast strength: pomcpp default 1 -> classic 2.
    assert int(o0["blast_strength"]) == 2
    assert int(o0["game_type"]) == 1
    assert int(o0["step_count"]) == 0
    # Float planes, classic dtype.
    assert o0["bomb_life"].dtype == np.float64
    assert o0["bomb_blast_strength"].dtype == np.float64
    # Board carries classic codes directly: corners hold Agent0..3.
    assert o0["board"][0, 0] == 10 and o0["board"][0, 10] == 11
    assert o0["board"][10, 10] == 12 and o0["board"][10, 0] == 13

    # Plant a bomb with agent 0: the classic planes must show blast
    # strength 2 at (0, 0) and the agent still on the board there.
    obs, *_ = env.step(np.array([5, 0, 0, 0]))
    o0 = obs[0]
    assert o0["bomb_blast_strength"][0, 0] == 2.0
    assert o0["bomb_life"][0, 0] > 0
    assert int(o0["ammo"]) == 0
    assert int(o0["step_count"]) == 1


def test_classic_encoding_team_mode():
    env = PommermanEnv(classic_encoding=True, team_mode=True)
    obs, _ = env.reset(seed=4)
    # Classic team pairing {0,2} vs {1,3}: teammate of 0 is agent 2 (=12);
    # enemies pad with AgentDummy.
    assert int(obs[0]["teammate"]) == 12
    assert obs[0]["enemies"] == [11, 13, 9]
    assert int(obs[1]["teammate"]) == 13
    assert obs[1]["enemies"] == [10, 12, 9]
    assert int(obs[0]["game_type"]) == 2


def test_classic_encoding_batched_shapes():
    env = PommermanEnv(batch_size=3, classic_encoding=True)
    obs, _ = env.reset(seed=5)
    o0 = obs[0]
    assert o0["board"].shape == (3, BOARD_SIZE, BOARD_SIZE)
    assert o0["position"].shape == (3, 2)
    assert o0["enemies"].shape == (3, 3)
    assert o0["bomb_blast_strength"].dtype == np.float64
    obs, rew, term, trunc, info = env.step(np.zeros((3, 4), np.int64))
    assert rew.shape == (3, 4)
