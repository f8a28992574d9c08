"""Exhaustive one-step conformance: all 6^4 joint moves vs the C++ oracle.

SURVEY.md ranks the simultaneous-movement re-derivation as the hardest part
of the rebuild and prescribes exhaustive per-scenario property testing.
This sweep applies every joint move (1296) to reference game states --
fresh boards, mid-game states after random warmup, kick-enabled states --
and diffs the exact engine bit-for-bit against the reference.  The cellular
engine is measured on the same sweep (its documented divergences bound the
mismatch count).
"""

import json
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.core.board_gen import init_state_np
from pomcpp_tpu.engine.cellular import CellState, cellular_step, from_state
from pomcpp_tpu.engine.step import step
from pomcpp_tpu.testing import oracle as orc

pytestmark = pytest.mark.skipif(
    orc.ensure_oracle() is None, reason="reference oracle not buildable"
)

ALL_MOVES = np.stack(
    [np.asarray([(c // 6**i) % 6 for i in range(4)]) for c in range(1296)]
)


def _oracle_enum(seed, warm_moves, kick):
    mode = "enumkick" if kick else "enum1"
    stream = "\n".join(
        " ".join(str(int(m)) for m in row) for row in warm_moves
    )
    out = subprocess.run(
        [orc.ORACLE_BIN, mode, hex(seed), str(len(warm_moves))],
        input=stream,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    dumps = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert len(dumps) == 1297
    return dumps[0], dumps[1:]


def _advance(seed, warm_moves, kick):
    s = init_state_np(seed)
    if kick:
        s = s._replace(agent_can_kick=jnp.ones((4,), bool))
    jstep = jax.jit(step)
    for mv in warm_moves:
        s = jstep(s, jnp.asarray(mv, jnp.int32))
    return s


@pytest.mark.parametrize(
    "seed,warm,kick",
    [(0x1337, 0, False), (2, 25, False), (3, 25, True), (5, 40, True)],
)
def test_exhaustive_one_step_parity(seed, warm, kick):
    rng = np.random.RandomState(seed ^ 0x5A5A)
    warm_moves = rng.randint(0, 6, size=(warm, 4))
    base_dump, dumps = _oracle_enum(seed, warm_moves, kick)

    s = _advance(seed, warm_moves, kick)
    d = orc.diff_dumps(base_dump, orc.state_to_dump(s))
    assert not d, "warmup state diverged: " + "; ".join(d[:5])

    # Exact engine: vmap the step over all 1296 joint moves at once.
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (1296,) + x.shape), s)
    out = jax.jit(jax.vmap(step))(batched, jnp.asarray(ALL_MOVES, jnp.int32))

    bad = []
    for c in range(1296):
        one = jax.tree.map(lambda x: x[c], out)
        diff = orc.diff_dumps(dumps[c], orc.state_to_dump(one))
        if diff:
            bad.append((ALL_MOVES[c].tolist(), diff[:3]))
    assert not bad, f"{len(bad)}/1296 joint moves diverge; first: {bad[:3]}"


@pytest.mark.parametrize("seed,warm,kick", [(2, 25, False), (3, 25, True)])
def test_exhaustive_one_step_cellular(seed, warm, kick):
    """Cellular engine on the same sweep: bounded, documented divergence."""
    rng = np.random.RandomState(seed ^ 0x5A5A)
    warm_moves = rng.randint(0, 6, size=(warm, 4))
    s = _advance(seed, warm_moves, kick)
    cs = from_state(s)

    batched_s = jax.tree.map(lambda x: jnp.broadcast_to(x, (1296,) + x.shape), s)
    batched_c = jax.tree.map(lambda x: jnp.broadcast_to(x, (1296,) + x.shape), cs)
    mv = jnp.asarray(ALL_MOVES, jnp.int32)
    ref = jax.jit(jax.vmap(lambda a, b: from_state(step(a, b))))(batched_s, mv)
    got = jax.jit(jax.vmap(cellular_step))(batched_c, mv)

    mismatch = 0
    for name in CellState._fields:
        if name == "timestep":
            continue
        a = np.asarray(getattr(ref, name)).reshape(1296, -1)
        b = np.asarray(getattr(got, name)).reshape(1296, -1)
        mismatch = max(mismatch, int((a != b).any(axis=1).sum()))
    # Documented divergence classes only (double-plant etc.); random warmup
    # states hit them rarely.
    assert mismatch <= 60, f"{mismatch}/1296 joint moves diverge"
