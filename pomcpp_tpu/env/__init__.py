from .environment import (  # noqa: F401
    EnvState,
    env_reset,
    env_reset_np,
    env_step,
    env_step_auto_reset,
    rollout,
)
from .gym_adapter import PommermanEnv  # noqa: F401
