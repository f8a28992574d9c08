"""Deep conformance soak (VERDICT r4 item 2): game-length oracle parity at
an order more seeds than the fast tier.

The exact engine is the conformance oracle for BOTH production engines
(cellular + pallas), so its own validation runs an order deeper here:

 - 100 seeds x 2 kick modes x 800-step random trajectories, bit-diffed
   against the compiled reference every step (the oracle stops early once
   aliveAgents <= 1, so these are full games by construction);
 - 25-seed full-game SimpleAgent parity (moves + state every step);
 - the full 6-move-alphabet (BOMB included) 3-agent exhaustive sweep on
   ALL three chain-reversion scenarios, 6^6 = 46656 two-step sequences
   each (the fast tier runs one scenario).

Excluded from the default run (`-m "not soak"` in pyproject addopts);
run with `make soak` / `pytest -m soak`.  Results ledger: BASELINE.md.
"""

import pytest

from pomcpp_tpu.testing import oracle as orc

from test_exhaustive_3agent import _run_sweep, _scenarios
from test_parity import _run_parity
from test_simple_agent import run_simple_game_parity

pytestmark = [
    pytest.mark.soak,
    pytest.mark.skipif(
        orc.ensure_oracle() is None, reason="reference oracle not buildable"
    ),
]

SOAK_TRAJ_SEEDS = list(range(100, 200))
SOAK_SIMPLE_SEEDS = [0x51337 + 13 * i for i in range(25)]


@pytest.mark.parametrize("seed", SOAK_TRAJ_SEEDS)
def test_trajectory_parity_soak(seed):
    _run_parity(seed, steps=800, kick=False)


@pytest.mark.parametrize("seed", SOAK_TRAJ_SEEDS)
def test_trajectory_parity_kick_soak(seed):
    _run_parity(seed, steps=800, kick=True)


@pytest.mark.parametrize("seed", SOAK_SIMPLE_SEEDS)
def test_simple_agent_game_parity_soak(seed):
    run_simple_game_parity(seed, steps=800)


@pytest.mark.parametrize("name", ["train_no_kick", "cross"])
def test_exhaustive_three_agent_full_alphabet(name):
    """6^3 x 6^3 sweep with plants on the remaining two scenarios (the
    fast tier covers train_kick, test_exhaustive_3agent.py:138)."""
    _run_sweep(name + "+bombs", _scenarios()[name], 6)


@pytest.mark.parametrize("seed,snap", [(120, 35), (147, 35), (176, 35)])
def test_randomized_state_exhaustive_sweep(seed, snap):
    """Randomized-state fuzz tier (r5): snapshot a random exact-engine
    trajectory mid-game (flames, revealed powerups, kicked bombs in
    flight, heterogeneous stats -- none of which the hand-built sweep
    scenarios contain), inject it into the compiled reference, and sweep
    all 5^6 two-step joint moves of three live agents.  Deeper runs:
    scripts/state_fuzz.py."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "state_fuzz",
        __import__("os").path.join(
            __import__("os").path.dirname(__file__), "..", "scripts",
            "state_fuzz.py",
        ),
    )
    sf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sf)
    bad = sf.fuzz_one(seed, snap, 5)
    if bad is None:
        pytest.skip("snapshot has < 3 live agents")
    assert bad == 0
