from .ascii import (  # noqa: F401
    print_state,
    render_dependency,
    render_dependency_chain,
    render_path,
    render_rmap,
    render_state,
)
