"""Driver for the C++ parity oracle (tools/oracle_dump.cpp).

Builds the unmodified reference engine out-of-tree, runs fixed-seed games
with injected move streams, and converts our plane-encoded ``State`` into
the reference's raw ``Item`` dump format so full trajectories can be diffed
bit-for-bit (reference encoding: include/bboard.hpp:54-71, 98-108).
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Any

import numpy as np

from ..core.constants import (
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

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ORACLE_BIN = os.path.join(_REPO, "build", "oracle_dump")

_RAW_FLAMES = 4 << 16
_RAW_WOOD = 2 << 8
_RAW_AGENT0 = 1 << 24


def ensure_oracle() -> str | None:
    """Build the oracle if missing; returns its path or None if unbuildable."""
    if os.path.exists(ORACLE_BIN):
        return ORACLE_BIN
    script = os.path.join(_REPO, "tools", "build_oracle.sh")
    if not os.path.exists("/root/reference/include/bboard.hpp"):
        return None
    r = subprocess.run(["sh", script], capture_output=True, text=True)
    if r.returncode != 0:
        return None
    return ORACLE_BIN


def oracle_board(seed: int) -> np.ndarray:
    """Raw board ints after InitBoardItems(seed)."""
    out = subprocess.run(
        [ORACLE_BIN, "board", hex(seed)], capture_output=True, text=True, timeout=30
    )
    assert out.returncode == 0, out.stderr
    return np.asarray(json.loads(out.stdout), np.int64)


def oracle_traj(seed: int, moves: np.ndarray, kick: bool = False) -> list[dict]:
    """Run ``moves`` ([steps, 4] ints) through the reference; dump per step.

    Returns the initial state plus one dump per executed step; the oracle
    stops early once aliveAgents <= 1 (after dumping that state).
    """
    stream = "\n".join(" ".join(str(int(m)) for m in row) for row in moves)
    out = subprocess.run(
        [ORACLE_BIN, "kicktraj" if kick else "traj", hex(seed), str(len(moves))],
        input=stream,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    return [json.loads(line) for line in out.stdout.splitlines() if line.strip()]


def state_to_dump(s: State) -> dict[str, Any]:
    """Convert our plane-encoded State into the oracle's dump structure."""
    board = np.asarray(s.board)
    hidden = np.asarray(s.hidden_pow)
    sig = np.asarray(s.flame_sig)

    raw = np.zeros(board.shape[0], np.int64)
    raw[board == C_PASSAGE] = 0
    raw[board == C_RIGID] = 1
    raw[board == C_BOMB] = 3
    raw[board == C_EXTRABOMB] = 6
    raw[board == C_INCRRANGE] = 7
    raw[board == C_KICK] = 8
    wood = board == C_WOOD
    raw[wood] = _RAW_WOOD + hidden[wood]
    flame = board == C_FLAME
    # Reference flame cells: FLAMES | (origin index << 3) | (powflag & 0b11)
    # (bboard.cpp:44-51, 206-210).
    raw[flame] = _RAW_FLAMES + (sig[flame] << 3) + (hidden[flame] & 0b11)
    ag = board >= C_AGENT0
    raw[ag] = _RAW_AGENT0 + (board[ag] - C_AGENT0)

    agents = [
        [
            int(np.asarray(s.agent_x)[i]),
            int(np.asarray(s.agent_y)[i]),
            int(np.asarray(s.agent_dead)[i]),
            int(np.asarray(s.agent_bomb_count)[i]),
            int(np.asarray(s.agent_max_bombs)[i]),
            int(np.asarray(s.agent_strength)[i]),
            int(np.asarray(s.agent_can_kick)[i]),
        ]
        for i in range(4)
    ]

    def logical(field, head, count, size):
        f = np.asarray(field)
        return [int(f[(int(head) + i) % size]) for i in range(int(count))]

    bh, bc = s.bomb_head, s.bomb_count
    bombs = list(
        map(
            list,
            zip(
                logical(s.bombs.x, bh, bc, MAX_BOMBS),
                logical(s.bombs.y, bh, bc, MAX_BOMBS),
                logical(s.bombs.id, bh, bc, MAX_BOMBS),
                logical(s.bombs.strength, bh, bc, MAX_BOMBS),
                logical(s.bombs.timer, bh, bc, MAX_BOMBS),
                logical(s.bombs.dir, bh, bc, MAX_BOMBS),
            ),
        )
    )
    fh, fc = s.flame_head, s.flame_count
    flames = list(
        map(
            list,
            zip(
                logical(s.flames.x, fh, fc, MAX_FLAMES),
                logical(s.flames.y, fh, fc, MAX_FLAMES),
                logical(s.flames.timer, fh, fc, MAX_FLAMES),
                logical(s.flames.strength, fh, fc, MAX_FLAMES),
            ),
        )
    )
    return {
        "board": raw.tolist(),
        "agents": agents,
        "bombs": bombs,
        "flames": flames,
        "alive": int(np.asarray(s.alive_count)),
    }


def dump_to_text(dump: dict) -> str:
    """Serialize a dump dict to the oracle's ``loadenum2`` stdin format."""
    parts = [" ".join(str(int(v)) for v in dump["board"])]
    for a in dump["agents"]:
        parts.append(" ".join(str(int(v)) for v in a))
    parts.append(str(len(dump["bombs"])))
    for b in dump["bombs"]:
        parts.append(" ".join(str(int(v)) for v in b))
    parts.append(str(len(dump["flames"])))
    for f in dump["flames"]:
        parts.append(" ".join(str(int(v)) for v in f))
    parts.append(str(int(dump["alive"])))
    return "\n".join(parts) + "\n"


def enum2_pair(dump: dict, agent_a: int, agent_b: int):
    """Run the oracle's 2-step 36x36 joint-move sweep over two agents on an
    injected state.  Returns ``(echoed_base, [1296 dumps])`` where sweep
    index ``code`` applies step-1 moves ``(code%36 % 6, code%36 // 6)`` and
    step-2 moves ``(code//36 % 6, code//36 // 6)`` to ``(agent_a, agent_b)``
    (other agents IDLE)."""
    import subprocess

    out = subprocess.run(
        [ORACLE_BIN, "loadenum2", str(agent_a), str(agent_b)],
        input=dump_to_text(dump),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    dumps = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert len(dumps) == 1297, len(dumps)
    return dumps[0], dumps[1:]


def enum3_trio(dump: dict, agent_a: int, agent_b: int, agent_c: int,
               n_moves: int = 5):
    """Run the oracle's 2-step (n_moves^3)^2 pruned-alphabet sweep over
    THREE agents on an injected state (``n_moves=5``: IDLE + directions,
    bombs pre-planted; ``n_moves=6`` adds BOMB for plant-interacting
    chains).  Returns ``(echoed_base, [n^6 dumps])``; sweep index ``code``
    applies step-1 moves ``(c1%n, c1//n%n, c1//n^2)`` with
    ``c1 = code % n^3`` and step-2 moves likewise from ``code // n^3`` to
    ``(agent_a, agent_b, agent_c)`` (the fourth agent IDLE)."""
    out = subprocess.run(
        [ORACLE_BIN, "loadenum3", str(agent_a), str(agent_b), str(agent_c),
         str(n_moves)],
        input=dump_to_text(dump),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr
    dumps = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert len(dumps) == n_moves ** 6 + 1, len(dumps)
    return dumps[0], dumps[1:]


def diff_dumps(ref: dict, mine: dict) -> list[str]:
    """Human-readable field-level differences between two dumps."""
    out = []
    rb, mb = np.asarray(ref["board"]), np.asarray(mine["board"])
    for c in np.nonzero(rb != mb)[0]:
        out.append(
            f"board[{c}] (x={c % BOARD_SIZE},y={c // BOARD_SIZE}): "
            f"ref={rb[c]:#x} mine={mb[c]:#x}"
        )
    for k in ("agents", "bombs", "flames", "alive"):
        if ref[k] != mine[k]:
            out.append(f"{k}: ref={ref[k]} mine={mine[k]}")
    return out
