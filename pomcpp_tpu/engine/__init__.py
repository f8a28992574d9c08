from .step import step  # noqa: F401
