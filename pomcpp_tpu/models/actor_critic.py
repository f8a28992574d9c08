"""Actor-critic network over fogged observations.

The reference has no learner at all (SURVEY.md §2.6 P4) -- scripted agents
only.  This model completes the RL story: a small convolutional torso over
egocentric observation planes (pomcpp_tpu.env.observation.observe_ego) with
policy (6 moves) and value heads.  Sized so self-play rollouts stay
device-bound: convolutions are the MXU path, activations bfloat16, params
float32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.constants import C_AGENT0
from ..env.observation import DEFAULT_VIEW_RANGE, Observation

N_MOVES = 6
# Board classes in view: passage..kick (0..8), fog(5) included, 4 agents.
_N_CLASSES = 9 + 4


def obs_to_features(obs: Observation, view_range: int = DEFAULT_VIEW_RANGE):
    """Observation -> [H, W, C] float feature map (jit/vmap friendly)."""
    w = 2 * view_range + 1
    board = obs.board.reshape(w, w)
    # Collapse agent codes into 9..12.
    cls = jnp.where(board >= C_AGENT0, board - C_AGENT0 + 9, board)
    onehot = jax.nn.one_hot(jnp.clip(cls, 0, _N_CLASSES - 1), _N_CLASSES)
    scalars = jnp.stack(
        [
            obs.bomb_timer.reshape(w, w) / 10.0,
            obs.bomb_strength.reshape(w, w) / 10.0,
            obs.bomb_dir.reshape(w, w) / 4.0,
            obs.flame_timer.reshape(w, w) / 4.0,
        ],
        axis=-1,
    )
    stats = jnp.broadcast_to(
        jnp.stack(
            [
                obs.max_bombs / 5.0,
                obs.bomb_count / 5.0,
                obs.strength / 10.0,
                obs.can_kick.astype(jnp.float32),
                obs.position[0] / 10.0,
                obs.position[1] / 10.0,
            ]
        ),
        (w, w, 6),
    )
    return jnp.concatenate(
        [onehot, scalars, stats], axis=-1
    ).astype(jnp.bfloat16)


class ActorCritic(nn.Module):
    """Conv torso + policy/value heads.  Input [H, W, C] (vmap for batch).

    ``layers=2`` (5x5 receptive field over the 9x9 view + the global dense
    mix) is the TPU-shaped default: a third 3x3 conv adds ~60% torso FLOPs
    for marginal capacity at this board size.
    """

    hidden: int = 128
    channels: int = 64
    layers: int = 2

    @nn.compact
    def __call__(self, features):
        x = features
        for _ in range(self.layers):
            x = nn.Conv(self.channels, (3, 3), dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
        x = x.reshape(-1)
        x = nn.relu(nn.Dense(self.hidden, dtype=jnp.bfloat16)(x))
        logits = nn.Dense(N_MOVES, dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=jnp.float32)(x)[0]
        return logits, value
