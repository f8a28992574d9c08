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
