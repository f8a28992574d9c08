"""Device-mesh sharding of the board batch (SURVEY.md §2.6 P3/P6).

The reference's only parallelism is one OS thread per independent
``Environment`` (unit_test/bboard/performance_test.cpp:71-94) and one thread
per agent inside a step (environment.cpp:95-116); it has no distributed
backend at all.  The TPU-native scale-out axis is the *boards* batch
dimension:

* intra-chip: ``jax.vmap`` steps thousands of lockstep boards;
* across chips/hosts: the batch is sharded over a 1-D ``boards`` mesh with
  ``NamedSharding``; the per-board step needs no cross-board communication,
  so the only collectives are metric/gradient reductions (``psum``), which
  XLA lays onto ICI.

TP/PP/SP meshes are deliberately absent: the state is 11x11 int cells and
any learner at Pommerman scale is DP-only (SURVEY.md §2.6 P4/P5 -- recorded
as N/A-by-design rather than cargo-culted).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..env.environment import EnvState, Policy, rollout

BOARDS_AXIS = "boards"


def boards_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``boards``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BOARDS_AXIS,))


def shard_batch(tree, mesh: Mesh):
    """Shard any batched pytree's leading axis over the ``boards`` mesh
    (EnvState, opponent FSM state, rollout buffers, ...)."""

    def put(x):
        spec = P(BOARDS_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_env_batch(es: EnvState, mesh: Mesh) -> EnvState:
    """Place a batched EnvState with its leading axis sharded over the mesh."""
    return shard_batch(es, mesh)


def sharded_rollout(
    mesh: Mesh, policy: Policy, n_steps: int, auto_reset: bool = True,
    team_mode: bool = False, max_steps: int = 0
) -> Callable:
    """Compile a boards-sharded batched rollout.

    Returns ``run(es) -> (final_es, metrics)`` where ``es`` is a batched
    EnvState whose leading axis is divisible by the mesh size.  Outputs keep
    the input sharding; XLA inserts no collectives for the env itself
    (boards are independent) -- reductions belong to the caller/learner.
    ``team_mode``/``max_steps`` forward to terminal detection (2v2
    outcomes; step-cap draws so stalemated boards recycle).
    """
    batch_rollout = jax.vmap(
        lambda e: rollout(e, policy, n_steps, auto_reset=auto_reset,
                          team_mode=team_mode, max_steps=max_steps)
    )
    spec = P(BOARDS_AXIS)
    shardings = NamedSharding(mesh, spec)
    return jax.jit(
        batch_rollout,
        in_shardings=(shardings,),
        out_shardings=shardings,
    )


def sharded_chunk_rollout(
    mesh: Mesh, steps: int = 64, policy: str = "random", *,
    interpret: bool = False, record: bool = False, auto_reset: bool = True,
    inject: bool = False, inject_slots: tuple = (), prng_rand: bool = False,
    inject_reset: bool = False,
) -> Callable:
    """Shard the fused Pallas chunk kernel (the production throughput path)
    over the ``boards`` mesh.

    Each device runs ``pomcpp_tpu.engine.pallas_step.pallas_rollout_chunk``
    on its local board shard under ``jax.shard_map``; boards are independent,
    so the program contains ZERO collectives — the multi-chip scale-out is
    pure SPMD replication of the kernel grid (the TPU analogue of the
    reference's N-independent-Environments thread mode,
    unit_test/bboard/performance_test.cpp:71-94).

    The in-kernel PRNG is decorrelated across devices by folding
    ``axis_index('boards')`` into the seed (inside one device the kernel
    already folds in ``program_id``).

    Mirrors the chunk kernel's modes: ``policy`` random/harmless/simple,
    ``inject`` + ``record`` for the test hooks (interpret-compatible),
    ``inject_slots``/``prng_rand`` for the mixed-control PPO configuration.

    Returns ``run(cs, seed, fsm_state=(), moves=())`` with the same output
    structure as ``pallas_rollout_chunk``; ``cs``/``fsm_state`` leading axes
    and ``moves`` axis 1 must be divisible by the mesh size.
    """
    from ..engine.pallas_step import pallas_rollout_chunk

    simple = policy == "simple"
    pb = P(BOARDS_AXIS)
    pmv = P(None, BOARDS_AXIS)

    def local(cs, seed, fsm_state, moves, reset_boards):
        # Per-device PRNG decorrelation (odd multiplier; per-block
        # decorrelation via program_id happens inside the kernel).
        seed = (jnp.asarray(seed, jnp.int32)
                + jax.lax.axis_index(BOARDS_AXIS).astype(jnp.int32)
                * jnp.int32(1_000_003))
        return pallas_rollout_chunk(
            cs, seed, steps=steps, interpret=interpret, policy=policy,
            moves=(moves if inject else None),
            record=record, auto_reset=auto_reset,
            fsm_state=(fsm_state if simple else None),
            inject_slots=tuple(inject_slots), prng_rand=prng_rand,
            reset_boards=(reset_boards if inject_reset else None),
        )

    in_specs = (pb, P(), pb if simple else P(), pmv if inject else P(),
                (pb, pb) if inject_reset else P())
    if simple and record:
        out_specs = (pb, pmv, pmv, pb)
    elif simple:
        out_specs = (pb, pb)
    elif record:
        out_specs = (pb, pmv, pmv)
    else:
        out_specs = pb

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation; the map is zero-collective (boards independent), so the
    # check has nothing to validate anyway.
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)

    def run(cs, seed, fsm_state=(), moves=(), reset_boards=()):
        return fn(cs, seed, fsm_state, moves, reset_boards)

    return jax.jit(run, static_argnames=())
