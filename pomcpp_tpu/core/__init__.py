from . import constants, queue, state  # noqa: F401
