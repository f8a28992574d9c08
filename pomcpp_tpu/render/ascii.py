"""Host-side terminal renderer (reference PrintState, src/bboard/bboard.cpp:403-489).

Renders a fetched ``State`` (single board) as colored unicode glyphs with the
reference's side panel: per-agent powerup stats beside the top rows, then the
bomb and flame queues.  Pure host code -- fetches device arrays once and
formats strings; never on the compute path.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import (
    AGENT_COUNT,
    BOARD_SIZE,
    C_AGENT0,
    C_BOMB,
    C_EXTRABOMB,
    C_FLAME,
    C_INCRRANGE,
    C_KICK,
    C_PASSAGE,
    C_RIGID,
    C_WOOD,
    MAX_BOMBS,
    MAX_FLAMES,
)
from ..core.state import State

_RESET = "\033[0m"
_AGENT_COLORS = ("\033[0;31m", "\033[0;34m", "\033[0;32m", "\033[0;33m")


def _glyph(item: int, color: bool) -> str:
    """3-char cell glyph (reference PrintItem, bboard.cpp:452-489)."""
    if item >= C_AGENT0:
        aid = item - C_AGENT0
        s = f" {aid} "
        return f"{_AGENT_COLORS[aid % 4]}{s}{_RESET}" if color else s
    table = {
        C_PASSAGE: "   ",
        C_RIGID: "[X]",
        C_WOOD: "[□]",
        C_BOMB: " ● ",
        C_FLAME: " ♨ ",
        C_EXTRABOMB: " b ",
        C_INCRRANGE: " r ",
        C_KICK: " k ",
    }
    s = table.get(item, " ? ")
    if color and item == C_FLAME:
        return f"\033[0;31m{s}{_RESET}"
    return s


def render_state(state, color: bool = True) -> str:
    """Format one board + agent/bomb/flame panel as a string.

    Accepts both the queue-encoded ``State`` and the plane-encoded
    ``CellState`` (bomb/flame panels read whichever representation exists).
    """
    is_cell = not hasattr(state, "bombs")
    board = np.asarray(state.board).reshape(BOARD_SIZE, BOARD_SIZE)
    ax = np.asarray(state.agent_x)
    ay = np.asarray(state.agent_y)
    dead = np.asarray(state.agent_dead)
    mb = np.asarray(state.agent_max_bombs)
    st = np.asarray(state.agent_strength)
    kick = np.asarray(state.agent_can_kick)

    lines = []
    for y in range(BOARD_SIZE):
        row = "".join(_glyph(int(board[y, x]), color) for x in range(BOARD_SIZE))
        panel = ""
        if y < AGENT_COUNT:
            i = y
            status = "DEAD" if dead[i] else f"({int(ax[i])},{int(ay[i])})"
            panel = (
                f"   agent {i} {status} bombs:{int(mb[i])} "
                f"range:{int(st[i])} kick:{int(kick[i])}"
            )
        elif y == AGENT_COUNT + 1:
            if is_cell:
                bt = np.asarray(state.bomb_timer)
                cells = np.nonzero(bt > 0)[0]
                items = [
                    f"({c % BOARD_SIZE},{c // BOARD_SIZE})t{bt[c]}"
                    for c in cells
                ]
            else:
                n = int(np.asarray(state.bomb_count))
                h = int(np.asarray(state.bomb_head))
                bx = np.asarray(state.bombs.x)
                by = np.asarray(state.bombs.y)
                bt = np.asarray(state.bombs.timer)
                items = [
                    f"({bx[(h + i) % MAX_BOMBS]},{by[(h + i) % MAX_BOMBS]})"
                    f"t{bt[(h + i) % MAX_BOMBS]}"
                    for i in range(n)
                ]
            panel = "   bombs: " + " ".join(items)
        elif y == AGENT_COUNT + 2:
            if is_cell:
                ft = np.asarray(state.flame_timer)
                cells = np.nonzero(ft > 0)[0]
                items = [
                    f"({c % BOARD_SIZE},{c // BOARD_SIZE})t{ft[c]}"
                    for c in cells
                ]
            else:
                n = int(np.asarray(state.flame_count))
                h = int(np.asarray(state.flame_head))
                fx = np.asarray(state.flames.x)
                fy = np.asarray(state.flames.y)
                ft = np.asarray(state.flames.timer)
                items = [
                    f"({fx[(h + i) % MAX_FLAMES]},{fy[(h + i) % MAX_FLAMES]})"
                    f"t{ft[(h + i) % MAX_FLAMES]}"
                    for i in range(n)
                ]
            panel = "   flames: " + " ".join(items)
        lines.append("║" + row + "║" + panel)

    top = "╔" + "═" * (3 * BOARD_SIZE) + "╗"
    bot = "╚" + "═" * (3 * BOARD_SIZE) + "╝"
    ts = int(np.asarray(state.timestep))
    alive = int(np.asarray(state.alive_count))
    return "\n".join([top] + lines + [bot, f"t={ts} alive={alive}"])


def print_state(state: State, color: bool = True, clear: bool = False) -> None:
    if clear:
        print("\033c", end="")
    print(render_state(state, color))


def render_rmap(rmap, color: bool = True) -> str:
    """Pretty-print a strategy RMap's distances (reference PrintMap,
    strategy.cpp:251-265)."""
    dist = np.asarray(rmap.dist).reshape(BOARD_SIZE, BOARD_SIZE)
    lines = []
    for y in range(BOARD_SIZE):
        lines.append(" ".join(f"{int(dist[y, x]):2d}" for x in range(BOARD_SIZE)))
    return "\n".join(lines)


def render_path(rmap, target: int, color: bool = True) -> str:
    """Distances with the predecessor path to ``target`` highlighted
    (reference PrintPath, strategy.cpp:268-294)."""
    dist = np.asarray(rmap.dist).reshape(BOARD_SIZE, BOARD_SIZE)
    pred = np.asarray(rmap.pred)
    src = int(np.asarray(rmap.source))
    path = set()
    cur = int(target)
    for _ in range(BOARD_SIZE * BOARD_SIZE):
        if cur == src:
            break
        path.add(cur)
        cur = int(pred[cur])
    red, reset = ("\033[0;31m", _RESET) if color else ("", "")
    lines = []
    for y in range(BOARD_SIZE):
        row = []
        for x in range(BOARD_SIZE):
            d = f"{int(dist[y, x]):2d}"
            c = x + BOARD_SIZE * y
            row.append(f"{red}{d}{reset}" if c in path else d)
        lines.append(" ".join(row))
    return "\n".join(lines)


def render_dependency(dependency) -> str:
    """Movement dependency array, one ``[i <- j]`` line per agent
    (reference PrintDependency, step_utility.cpp:339-354)."""
    dep = np.asarray(dependency)
    lines = []
    for i in range(len(dep)):
        d = int(dep[i])
        lines.append(f"[{i} <- ]" if d == -1 else f"[{i} <- {d}]")
    return "\n".join(lines)


def render_dependency_chain(dependency, chain) -> str:
    """Each movement chain walked root-to-tail, ``r <- a <- b`` per line
    (reference PrintDependencyChain, step_utility.cpp:356-371)."""
    dep = np.asarray(dependency)
    lines = []
    for c in np.asarray(chain):
        c = int(c)
        if c == -1:
            continue
        parts = [str(c)]
        k = int(dep[c])
        while k != -1:
            parts.append(str(k))
            k = int(dep[k])
        lines.append(" <- ".join(parts))
    return "\n".join(lines)
