from .mesh import (  # noqa: F401
    BOARDS_AXIS,
    boards_mesh,
    shard_batch,
    shard_env_batch,
    sharded_chunk_rollout,
    sharded_rollout,
)
