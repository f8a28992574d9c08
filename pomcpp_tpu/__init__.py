"""pomcpp_tpu: a TPU-native Pommerman framework.

Built from scratch in JAX (XLA + Pallas) with the full capabilities of the
reference C++ engine (dist1ll/pomcpp) and the learner/fog/team/distributed
stack it only stubs.  Three step engines over one game:

* ``engine.step.step``              -- exact conformance engine (C++ bit-parity)
* ``engine.cellular.cellular_step`` -- plane-based production engine
* ``engine.pallas_step``            -- fused TPU kernels (single-step + chunk)

See README.md for the layout and docs/COMPONENTS.md for the reference
component traceability.
"""

from .core import constants  # noqa: F401
from .core.state import State, empty_state  # noqa: F401
from .engine.cellular import CellState, cellular_step, from_state, to_state  # noqa: F401
from .engine.step import step  # noqa: F401
from .env import (  # noqa: F401
    EnvState,
    env_reset,
    env_reset_np,
    env_step,
    env_step_auto_reset,
    rollout,
)

__all__ = [
    "constants",
    "State",
    "empty_state",
    "step",
    "CellState",
    "cellular_step",
    "from_state",
    "to_state",
    "EnvState",
    "env_reset",
    "env_reset_np",
    "env_step",
    "env_step_auto_reset",
    "rollout",
]
__version__ = "0.1.0"
