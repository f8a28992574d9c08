from .mesh import (  # noqa: F401
    boards_mesh,
    shard_env_batch,
    sharded_rollout,
)
