"""Board generation: host-side parity generator + on-device batched generator.

Two generators with the same board distribution:

* ``init_board_items_np`` -- bit-exact replica of the reference
  ``InitBoardItems`` (pomcpp src/bboard/bboard.cpp:345-381) including its
  quirks, driven by the host-side MT19937-64 (core.rng).  Used by the parity
  harness and by tests that pin boards to reference seeds.
* ``random_board`` -- pure ``jax.random`` generator producing boards with the
  same marginal distribution (1/7 rigid, 1/7 wood, ceil(wood/2) hidden
  powerups drawn uniformly from {extrabomb, incrrange, kick, none}), jittable
  and vmappable for on-device batched resets at scale.

Replicated reference quirks (bboard.cpp:360-380):

* ``idxSample(0, q.count)`` has an *inclusive* upper bound, so the powerup
  loop can sample one-past-the-end of the wood queue -- an uninitialized
  stack read in the reference.  We model that read as value 0 (i.e. cell
  (0,0), a corner that agent placement overwrites); the parity harness
  validates the model against the compiled oracle.
* The powerup flag is drawn from [1, 4] but revealed through ``& 0b11``
  (bboard.hpp:106-108), so a drawn 4 is "empty wood".
* A cell qualifies for a flag when its low byte is 0 -- PASSAGE qualifies
  too, so the modeled out-of-bounds sample can corrupt cell (0,0).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .constants import (
    BOARD_SIZE,
    C_PASSAGE,
    C_RIGID,
    C_WOOD,
    NUM_CELLS,
)
from .rng import MT19937_64, UniformIntDistribution
from .state import I32, State, empty_state, put_agents_in_corners

# Reference raw Item codes (bboard.hpp:54-71), used only inside the replica.
_RAW_PASSAGE = 0
_RAW_RIGID = 1
_RAW_WOOD = 2 << 8

DEFAULT_SEED = 0x1337


def init_board_items_raw(seed: int = DEFAULT_SEED) -> np.ndarray:
    """Replica of ``InitBoardItems`` (bboard.cpp:345-381), raw Item codes.

    Returns the board exactly as the reference encodes it (int64[NUM_CELLS]
    of raw ``Item`` values), for bit-level diffing against the oracle.
    """
    rng = MT19937_64(seed)
    int_dist = UniformIntDistribution(0, 6)

    raw = np.zeros(NUM_CELLS, np.int64)
    wood_q: list[int] = []
    # Cells are drawn in flat-index order: the reference iterates
    # board[i][j] with queue index j + BOARD_SIZE*i (bboard.cpp:352-363).
    for c in range(NUM_CELLS):
        tmp = int_dist(rng)
        # ChooseItemOuter (bboard.cpp:59-74): 1 -> rigid, 2 -> wood, else passage.
        if tmp == 1:
            raw[c] = _RAW_RIGID
        elif tmp == 2:
            raw[c] = _RAW_WOOD
            wood_q.append(c)

    idx_sample = UniformIntDistribution(0, len(wood_q))  # inclusive quirk
    choose_pwp = UniformIntDistribution(1, 4)
    total = 0
    while True:
        pos = idx_sample(rng)
        # pos == len(wood_q) is the reference's uninitialized stack read;
        # modeled as slot value 0 (validated against the compiled oracle).
        idx = wood_q[pos] if pos < len(wood_q) else 0
        if (raw[idx] & 0xFF) == 0:
            raw[idx] += choose_pwp(rng)
            total += 1
        if total >= len(wood_q) / 2:
            break
    return raw


def init_board_items_np(seed: int = DEFAULT_SEED):
    """``InitBoardItems`` decoded into this package's plane encoding.

    Returns ``(board, hidden_pow)`` int32 ndarrays of shape [NUM_CELLS].
    """
    raw = init_board_items_raw(seed)
    board = np.zeros(NUM_CELLS, np.int32)
    hidden = np.zeros(NUM_CELLS, np.int32)
    for c in range(NUM_CELLS):
        r = int(raw[c])
        if r >> 8 == 2:  # wood (possibly with flag in the low byte)
            board[c] = C_WOOD
            hidden[c] = r & 0xFF
        elif r == _RAW_RIGID:
            board[c] = C_RIGID
        elif r == _RAW_PASSAGE:
            board[c] = C_PASSAGE
        else:
            # Only reachable through the modeled OOB sample corrupting a
            # passage cell: keep it blocking, like the reference's invalid
            # item (not walkable, not static-block).
            board[c] = C_RIGID
    return board, hidden


def init_state_np(seed: int = DEFAULT_SEED, a0=0, a1=1, a2=2, a3=3) -> State:
    """Replica of ``InitState`` (bboard.cpp:338-343): items + corner agents."""
    board, hidden = init_board_items_np(seed)
    s = empty_state()
    s = s._replace(board=jnp.asarray(board), hidden_pow=jnp.asarray(hidden))
    return put_agents_in_corners(s, a0, a1, a2, a3)


# --- On-device generator (jax.random; same distribution, not bit-equal) -------


def random_board(key: jax.Array):
    """Generate one board's (board, hidden_pow) planes on-device.

    Matches the reference distribution: per cell P(rigid)=P(wood)=1/7;
    ceil(n_wood/2) of the wood cells get a flag uniform in [1,4] (4 = none).
    Jittable; vmap over keys for batched resets.
    """
    k_cell, k_rank, k_flag = jax.random.split(key, 3)
    tmp = jax.random.randint(k_cell, (NUM_CELLS,), 0, 7)
    board = jnp.where(
        tmp == 1,
        C_RIGID,
        jnp.where(tmp == 2, C_WOOD, C_PASSAGE),
    ).astype(I32)
    wood = board == C_WOOD
    n_wood = jnp.sum(wood)

    # Select ceil(n_wood/2) wood cells by random rank.
    score = jnp.where(wood, jax.random.uniform(k_rank, (NUM_CELLS,)), 2.0)
    order = jnp.argsort(score)
    rank = jnp.zeros(NUM_CELLS, I32).at[order].set(jnp.arange(NUM_CELLS, dtype=I32))
    n_flag = (n_wood + 1) // 2
    flagged = wood & (rank < n_flag)
    flags = jax.random.randint(k_flag, (NUM_CELLS,), 1, 5)
    hidden = jnp.where(flagged, flags, 0).astype(I32)
    return board, hidden


def random_state(key: jax.Array, randomize_positions: bool = False) -> State:
    """On-device fresh game state: random board + agents in corners.

    ``randomize_positions`` permutes the corner assignment from the key --
    the reference's ``MakeGame(randomizePositions=true)``
    (environment.cpp:53-66, the ``std::random_shuffle`` at :60; unseeded
    there, keyed here).  Default off = reference default + parity mode.
    """
    k_board, k_perm = jax.random.split(key)
    board, hidden = random_board(k_board if randomize_positions else key)
    s = empty_state()
    s = s._replace(board=board, hidden_pow=hidden)
    if randomize_positions:
        p = jax.random.permutation(k_perm, 4)
        return put_agents_in_corners(s, p[0], p[1], p[2], p[3])
    return put_agents_in_corners(s, 0, 1, 2, 3)


def random_board_fast(key: jax.Array):
    """Cheap on-device board: like ``random_board`` but wood cells carry a
    hidden powerup independently with p=1/2 (binomial count) instead of the
    reference's exact ceil(n_wood/2) -- skips the per-reset argsort, which
    dominates auto-reset cost at scale.  The marginal flag rate is close
    but not identical: exact ceil(n/2)/n exceeds 1/2 for odd wood counts
    (E[.] ~ 0.515 at n ~ Binomial(121, 1/7)), so fast boards average
    ~1.4% fewer hidden powerups.
    """
    k_cell, k_sel, k_flag = jax.random.split(key, 3)
    tmp = jax.random.randint(k_cell, (NUM_CELLS,), 0, 7)
    board = jnp.where(
        tmp == 1,
        C_RIGID,
        jnp.where(tmp == 2, C_WOOD, C_PASSAGE),
    ).astype(I32)
    wood = board == C_WOOD
    flagged = wood & (jax.random.uniform(k_sel, (NUM_CELLS,)) < 0.5)
    flags = jax.random.randint(k_flag, (NUM_CELLS,), 1, 5)
    hidden = jnp.where(flagged, flags, 0).astype(I32)
    return board, hidden


def random_cell_state(key: jax.Array, fast_boards: bool = True,
                      randomize_positions: bool = False):
    """On-device fresh plane-encoded game state (engine.cellular).

    ``fast_boards=True`` (the default, used by ``env_reset(engine=
    "cellular")`` and hence training) draws the hidden-powerup count as
    Binomial(n_wood, 1/2) via ``random_board_fast`` instead of the
    reference's exact ceil(n_wood/2); pass ``fast_boards=False`` for the
    reference's count distribution (costs an argsort per reset).

    ``randomize_positions`` permutes the corner assignment from the key
    (reference ``MakeGame``'s optional ``std::random_shuffle``,
    environment.cpp:53-66) so training sees every seat; default off keeps
    the reference default / parity behaviour.
    """
    from ..engine.cellular import empty_cell_state

    k_board, k_perm = jax.random.split(key)
    board_key = k_board if randomize_positions else key
    board, hidden = (
        random_board_fast(board_key) if fast_boards
        else random_board(board_key)
    )
    cs = empty_cell_state()._replace(board=board, hidden_pow=hidden)
    # put_agents_in_corners is duck-typed over board/agent_x/agent_y.
    if randomize_positions:
        p = jax.random.permutation(k_perm, 4)
        return put_agents_in_corners(cs, p[0], p[1], p[2], p[3])
    return put_agents_in_corners(cs, 0, 1, 2, 3)
