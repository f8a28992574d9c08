from .ascii import render_state, print_state  # noqa: F401
