"""pomcpp_tpu: a TPU-native Pommerman engine and rollout framework.

Built from scratch in JAX (XLA) with the same capabilities as the reference
C++ engine (dist1ll/pomcpp): a fixed-shape game-state PyTree, a pure jittable
forward step with bit-faithful semantics, scripted policies, batched vmapped
environments sharded over TPU meshes, and a training stack on top.
"""

from .core import constants
from .core.state import State, empty_state
from .engine.step import step

__all__ = ["constants", "State", "empty_state", "step"]
__version__ = "0.1.0"
