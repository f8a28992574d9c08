from .ascii import render_path, render_rmap, render_state, print_state  # noqa: F401
