from .basic import harmless_agent, lazy_agent, random_agent  # noqa: F401
