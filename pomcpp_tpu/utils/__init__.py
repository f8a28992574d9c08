from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .device_lock import hold_tpu_client_lock, tpu_client_lock  # noqa: F401
from .replay import load_replay, record_game, replay_frame, save_replay  # noqa: F401
