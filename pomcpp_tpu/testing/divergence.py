"""Attribution of cellular-vs-exact mismatches to documented divergence
classes (engine/cellular.py header, classes 1-4).

The cellular production engine substitutes four explicit rule choices for
reference queue artifacts (stacked plants, stale plant directions, DFS
chain ordering, queue-order pileups -- /root/reference/src/bboard/
bboard.cpp:125-146, step_utility.cpp:224-245).  ``divergence_classes``
inspects a transition's *preconditions* and reports which classes could
explain a mismatch on it; tests assert every mismatch is attributable,
and scripts/divergence_census.py measures how often each class fires in
real play (VERDICT r4 item 3).
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_BOMB, MAX_BOMBS


def divergence_classes(pre, mv, post_exact, pre_exact=None) -> list[str]:
    """Which documented divergence classes (cellular.py header, 1-4) could
    explain a mismatch on this transition, from its *preconditions*.

    ``pre`` / ``post_exact`` are single-board ``CellState``s (the exact
    engine's pre/post states in plane form), ``mv`` the 4 moves.
    ``pre_exact`` (optional) is the exact queue-encoded ``State`` pre-step:
    it sharpens class 2 to cover stale-direction plants whose bomb slides
    into a flame and EXPLODES the same step (no new bomb in the post state
    for the plane-level test to see -- found by the r5 census).
    """
    mv = np.asarray(mv)
    classes = []
    cells = np.asarray(pre.agent_x) + 11 * np.asarray(pre.agent_y)
    alive = ~np.asarray(pre.agent_dead)
    pre_bt = np.asarray(pre.bomb_timer)
    post_bt = np.asarray(post_exact.bomb_timer)
    can_plant = (
        (mv == M_BOMB)
        & alive
        & (np.asarray(pre.agent_bomb_count) < np.asarray(pre.agent_max_bombs))
    )
    # 1: plant onto a cell already holding a bomb (reference stacks them).
    if np.any(can_plant & (pre_bt[cells] > 0)):
        classes.append("1:stacked-plant")
    # 2: fresh plant in a recycled queue slot inherits a stale direction.
    new_bomb = (post_bt > 0) & (pre_bt == 0)
    if np.any(new_bomb & (np.asarray(post_exact.bomb_dir) != 0)):
        classes.append("2:stale-plant-direction")
    elif pre_exact is not None and np.any(can_plant):
        # Queue-precise variant: the j-th plant this step lands in raw slot
        # (head + count + j) % MAX_BOMBS (reference PlantBomb appends,
        # bboard.cpp:125-146, recycling whatever direction the slot last
        # held).  A stale dir there can make the fresh bomb slide -- and if
        # it slides into a flame it explodes the SAME step, leaving no new
        # bomb for the plane test above.
        head = int(np.asarray(pre_exact.bomb_head))
        count = int(np.asarray(pre_exact.bomb_count))
        dirs = np.asarray(pre_exact.bombs.dir)
        j = 0
        for i in range(4):
            if can_plant[i]:
                if dirs[(head + count + j) % MAX_BOMBS] != 0:
                    classes.append("2:stale-plant-direction")
                    break
                j += 1
    # 3: >=2 bombs exploded this step -> BFS-vs-DFS chain ordering.
    if np.sum((pre_bt > 0) & (post_bt == 0)) >= 2:
        classes.append("3:multi-bomb-chain")
    # 4: bomb PILEUP ordering (cell-order counting vs the reference's
    # queue-windowed scan).  Preconditions: (a) >=2 bombs moving/kicked
    # this step, or (b) a single kicked bomb whose slide target already
    # holds a STATIONARY bomb -- the reference's windowed
    # HasBombCollision/ResolveBombCollision leaves the kicker standing
    # on the stopped bomb in configurations where the cellular per-cell
    # arrival count bounces it (found by the r5 SimpleAgent-policy
    # census: FSM agents kick their own fresh bombs into bomb columns).
    pre_moving = np.asarray(pre.bomb_dir) != 0
    dx = np.array([0, 0, 0, -1, 1])[np.clip(mv, 0, 4)] * (mv <= 4)
    dy = np.array([0, -1, 1, 0, 0])[np.clip(mv, 0, 4)] * (mv <= 4)
    tx = np.clip(np.asarray(pre.agent_x) + dx, 0, 10)
    ty = np.clip(np.asarray(pre.agent_y) + dy, 0, 10)
    kick_cand = (
        alive
        & np.asarray(pre.agent_can_kick)
        & (mv >= 1)
        & (mv <= 4)
        & (pre_bt[tx + 11 * ty] > 0)
    )
    if np.sum(pre_moving) + np.sum(kick_cand) >= 2:
        classes.append("4:multi-bomb-pileup")
    else:
        # (b): the kicked bomb's own slide target (one further along the
        # kick direction, when in bounds) holds another bomb.
        for i in range(4):
            if not kick_cand[i]:
                continue
            bx, by = tx[i] + dx[i], ty[i] + dy[i]
            if 0 <= bx <= 10 and 0 <= by <= 10 and pre_bt[bx + 11 * by] > 0:
                classes.append("4:multi-bomb-pileup")
                break
    return classes
