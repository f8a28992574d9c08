"""Scripted baseline policies (reference src/agents/basic_agents.cpp).

Each policy is a pure jittable function ``(key, state, agent_id) -> move``;
batch evaluation is ``vmap`` over boards and agents (the TPU replacement for
the reference's one-thread-per-agent actor model, environment.cpp:95-116).

The reference agents seed a per-object mt19937_64 from ``std::random_device``
(basic_agents.cpp:12-22) and are therefore non-reproducible by design; here
randomness flows from an explicit ``jax.random`` key, deterministic by
construction.  The parity harness injects identical move streams on both
sides instead of comparing RNGs (SURVEY.md §2.6 P7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import I32, State


def lazy_agent(key: jax.Array, state: State, agent_id) -> jax.Array:
    """Always IDLE (reference LazyAgent, basic_agents.cpp:44-47)."""
    del key, state, agent_id
    return jnp.zeros((), I32)


def random_agent(key: jax.Array, state: State, agent_id) -> jax.Array:
    """Uniform over all 6 moves incl. BOMB (RandomAgent, basic_agents.cpp:12-22)."""
    del state, agent_id
    return jax.random.randint(key, (), 0, 6, I32)


def harmless_agent(key: jax.Array, state: State, agent_id) -> jax.Array:
    """Uniform over the 5 non-bomb moves (HarmlessAgent, basic_agents.cpp:28-38)."""
    del state, agent_id
    return jax.random.randint(key, (), 0, 5, I32)
