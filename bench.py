"""Throughput benchmark: env steps/s on one chip, reference configuration.

Mirrors the reference's benchmark protocol (unit_test/bboard/
performance_test.cpp:52-112: rounds of Environment::Step, report steps/time)
scaled to the TPU execution model: 16384 lockstep boards stepped in fused
64-step kernel chunks with HarmlessAgent-style policies (uniform non-bomb
moves) and auto-reset -- the exact configuration behind the reference's
published figure ("Tested with: agents::HarmlessAgent", README.md:99).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the reference's published 586,332 env
steps per 100 ms (≈5.86 M steps/s on a 4-core Skylake i5, README.md:90-98).
The harder random-with-bombs configuration is tracked in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import jax

BASELINE_STEPS_PER_S = 5_863_320.0
BATCH = 16384
CHUNK = 256  # steps per device call (r5: longer chunks amortize chunk-
             # boundary work -- launch, state pack/unpack, fresh-board
             # gen; 64 -> 128 -> 256 measured +4-8% each on every
             # config; 512 crashes the remote compile helper)
ROUNDS = 3  # best-of rounds; the first round is coldest (pipeline + board
            # mix), and scripts/bench_chunk.py's 3-round protocol is the
            # one the ledger numbers come from

# Persistent compilation cache: the driver re-runs this script every round.
jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def _watchdog(seconds: int = 1800) -> None:
    """The axon TPU tunnel can wedge (first device op hangs forever); emit a
    sentinel result instead of hanging the driver."""

    def fire(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "env_steps_per_s_single_chip_harmless_config",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": "tpu unavailable (watchdog timeout)",
                }
            ),
            flush=True,
        )
        os._exit(0)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def _bench_pallas(policy: str = "harmless", batch: int = BATCH,
                  rounds: int = ROUNDS, per_round: int = 4) -> float:
    """Fused-kernel path: whole 64-step chunks run in one Pallas launch."""
    import jax.numpy as jnp

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.engine.pallas_step import (
        pallas_rollout_chunk,
        simple_fsm_state_init,
    )

    cs = jax.jit(jax.vmap(random_cell_state))(
        jax.random.split(jax.random.PRNGKey(0), batch)
    )
    fsm = simple_fsm_state_init(batch) if policy == "simple" else None

    def run(cs, fsm, seed):
        if policy == "simple":
            return pallas_rollout_chunk(
                cs, seed, steps=CHUNK, policy=policy, fsm_state=fsm
            )
        return pallas_rollout_chunk(cs, seed, steps=CHUNK, policy=policy), fsm

    cs, fsm = run(cs, fsm, 7)
    float(jnp.sum(cs.alive_count))  # host fetch = real barrier

    best = 0.0
    for r in range(rounds):
        t0 = time.perf_counter()
        for k in range(per_round):
            cs, fsm = run(cs, fsm, 100 + r * per_round + k)
        float(jnp.sum(cs.alive_count))
        dt = time.perf_counter() - t0
        best = max(best, batch * CHUNK * per_round / dt)
    return best


def _bench_pallas_sharded() -> float:
    """The production chunk kernel under a boards mesh (shard_map) over all
    available devices -- on this rig a mesh of 1 chip, which must cost
    ~nothing vs the unsharded launch (proves the multi-chip path adds zero
    sharding overhead; VERDICT r2 item 1)."""
    import jax.numpy as jnp

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.parallel import boards_mesh, shard_batch, \
        sharded_chunk_rollout

    mesh = boards_mesh()
    cs = jax.jit(jax.vmap(random_cell_state))(
        jax.random.split(jax.random.PRNGKey(0), BATCH)
    )
    cs = shard_batch(cs, mesh)
    run = sharded_chunk_rollout(mesh, steps=CHUNK, policy="harmless")

    cs = run(cs, 7)
    float(jnp.sum(cs.alive_count))  # host fetch = real barrier

    best = 0.0
    per_round = 4
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        for k in range(per_round):
            cs = run(cs, 300 + r * per_round + k)
        float(jnp.sum(cs.alive_count))
        dt = time.perf_counter() - t0
        best = max(best, BATCH * CHUNK * per_round / dt)
    return best


def _bench_xla() -> float:
    """Fallback: the vmapped XLA cellular engine."""
    import jax.numpy as jnp

    from pomcpp_tpu.agents import harmless_agent
    from pomcpp_tpu.env import env_reset, rollout

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    es = jax.jit(jax.vmap(lambda k: env_reset(k, engine="cellular")))(keys)
    jax.block_until_ready(es)

    run = jax.jit(
        jax.vmap(lambda e: rollout(e, harmless_agent, CHUNK, auto_reset=True))
    )
    es, _ = run(es)
    jax.block_until_ready(es)

    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        es, metrics = run(es)
        # Host fetch = real barrier (axon's block_until_ready can return
        # before the device work finishes).
        float(jnp.sum(es.game.alive_count))
        dt = time.perf_counter() - t0
        best = max(best, BATCH * CHUNK / dt)
    return best


def _ref_same_host() -> dict:
    """Run the reference's own benchmark (tools/ref_perf.cpp, the protocol
    of performance_test.cpp:52-112) on THIS host for apples-to-apples
    ratios; the published 5.86M figure is from a 2015 4-core i5.  Best
    effort: silently skipped if the toolchain or reference is absent."""
    import re
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    binp = os.path.join(root, "build", "ref_perf")
    if not os.path.exists(binp):
        if not os.path.isdir("/root/reference"):
            return {}
        srcs = [
            os.path.join(root, "tools", "ref_perf.cpp"),
            "/root/reference/src/bboard/bboard.cpp",
            "/root/reference/src/bboard/environment.cpp",
            "/root/reference/src/bboard/step.cpp",
            "/root/reference/src/bboard/step_utility.cpp",
            "/root/reference/src/bboard/strategy.cpp",
            "/root/reference/src/agents/simple_agent.cpp",
            "/root/reference/src/agents/basic_agents.cpp",
        ]
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-march=native",
                 "-I/root/reference/include", *srcs, "-pthread", "-o", binp],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return {}
    out = {}
    for mode, key in (("harmless", "ref_same_host_harmless_steps_per_s"),
                      ("simple", "ref_same_host_simple_steps_per_s")):
        # Best of 3: the 4-thread join-barrier protocol is wildly bimodal
        # on this shared-vCPU host (measured 2.4M vs 12.2M back-to-back on
        # an idle box) -- give the reference its best run so our ratios
        # stay conservative.
        best = 0
        for _ in range(3):
            try:
                r = subprocess.run(
                    [binp, mode, "4"], capture_output=True, text=True,
                    timeout=120, check=True,
                )
                m = re.search(r"steps_per_s=(\d+)", r.stdout)
                if m:
                    best = max(best, int(m.group(1)))
            except Exception:
                pass
        if best:
            out[key] = best
    return out


class _Deadline(Exception):
    pass


def main() -> None:
    _watchdog()

    # Serialize against any other TPU client on this host: the axon tunnel
    # serves one client; a concurrent second client has wedged it (see
    # pomcpp_tpu/utils/device_lock.py).  Held until process exit.
    from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock

    hold_tpu_client_lock(timeout_s=600)

    # The fused kernel is the fastest path (~2.7M steps/s) but costs ~7.5 min
    # of first compile (no cache hit through the axon AOT helper); give it a
    # bounded shot and fall back to the XLA cellular path (~2 min total,
    # ~2M steps/s) so the driver always gets a real number.
    def deadline(signum, frame):
        raise _Deadline()

    t_start = time.perf_counter()
    signal.signal(signal.SIGALRM, deadline)
    signal.alarm(900)
    try:
        best = _bench_pallas("harmless")
        path = "pallas_chunk"
        signal.alarm(0)
    except BaseException as e:
        signal.alarm(0)
        print(f"pallas path failed ({type(e).__name__}: {e}); "
              "falling back to XLA cellular", file=sys.stderr, flush=True)
        _watchdog()  # re-arm the hang watchdog
        best = _bench_xla()
        path = "xla_cellular"

    # Additional tracked configs: random-with-bombs (plants/kicks/chains
    # active -- the engine actually playing Bomberman) and SimpleAgent
    # self-play (the reference's checked-in benchmark policy,
    # performance_test.cpp:38, via the in-kernel FSM).  Bounded; omitted on
    # timeout rather than failing the headline.
    random_sps = None
    simple_sps = None
    sharded_sps = None
    if path == "pallas_chunk":
        for name in ("random", "simple", "sharded"):
            if time.perf_counter() - t_start > 1100:
                print(f"skipping {name} config (time budget)",
                      file=sys.stderr, flush=True)
                continue
            signal.alarm(480)
            try:
                sps = (_bench_pallas_sharded() if name == "sharded"
                       else _bench_pallas(name))
                signal.alarm(0)
                if name == "random":
                    random_sps = sps
                elif name == "simple":
                    simple_sps = sps
                else:
                    sharded_sps = sps
            except BaseException as e:
                signal.alarm(0)
                print(f"{name} config failed ({type(e).__name__}: {e})",
                      file=sys.stderr, flush=True)
                _watchdog()

    # Batch-scaling curve (VERDICT r4 item 4): the same three configs at
    # 4096 (BASELINE.json's literal ">=10M at 4096 boards" north-star
    # wording) and 65536 (config 5's 64K-board point); the 16384 points
    # are the headline numbers above.  Short protocol (2 rounds x 2
    # chunks) -- the curve documents scaling shape, not the headline.
    curve = {}
    if path == "pallas_chunk":
        for pol in ("harmless", "random", "simple"):
            # 131072 added post-r5: the curve still rises ~2-4% past
            # 65536 (docs/PERF.md); budget-guarded like every point.
            for bsz in (4096, 65536, 131072):
                if time.perf_counter() - t_start > 1500:
                    print(f"skipping curve {pol}@{bsz} (time budget)",
                          file=sys.stderr, flush=True)
                    continue
                signal.alarm(420)
                try:
                    sps = _bench_pallas(pol, batch=bsz, rounds=2,
                                        per_round=2)
                    signal.alarm(0)
                    curve[f"{pol}_{bsz}_steps_per_s"] = round(sps, 1)
                except BaseException as e:
                    signal.alarm(0)
                    print(f"curve {pol}@{bsz} failed "
                          f"({type(e).__name__}: {e})",
                          file=sys.stderr, flush=True)
                    _watchdog()

    out = {
        "metric": "env_steps_per_s_single_chip_harmless_config",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / BASELINE_STEPS_PER_S, 3),
        "steps_per_100ms": round(best / 10),  # reference report unit
        "path": path,
    }
    out.update(curve)
    if random_sps is not None:
        out["random_with_bombs_steps_per_s"] = round(random_sps, 1)
        out["random_with_bombs_vs_baseline"] = round(
            random_sps / BASELINE_STEPS_PER_S, 3
        )
    if simple_sps is not None:
        out["simple_agent_steps_per_s"] = round(simple_sps, 1)
        out["simple_agent_vs_baseline"] = round(
            simple_sps / BASELINE_STEPS_PER_S, 3
        )
        # The published 5.86M is the CHEAP-policy (HarmlessAgent) config
        # (README.md:99); the reference's own SimpleAgent throughput on
        # THIS host is ref_same_host_simple_steps_per_s -- that ratio
        # (simple_agent_vs_ref_same_host) is the like-for-like one.
        out["simple_agent_vs_baseline_note"] = (
            "denominator is the cheap-policy published figure; see "
            "simple_agent_vs_ref_same_host for like-for-like"
        )
    if sharded_sps is not None:
        # The chunk kernel under shard_map on a mesh of len(jax.devices())
        # (1 chip here); the fraction vs the unsharded launch is the
        # sharding overhead (target: >= 0.95).
        out["sharded_mesh_steps_per_s"] = round(sharded_sps, 1)
        out["sharded_mesh_devices"] = len(jax.devices())
        out["sharded_mesh_frac_of_unsharded"] = round(sharded_sps / best, 3)
    ref = _ref_same_host()
    out.update(ref)
    if "ref_same_host_harmless_steps_per_s" in ref:
        out["vs_ref_same_host"] = round(
            best / ref["ref_same_host_harmless_steps_per_s"], 3
        )
    if simple_sps is not None and "ref_same_host_simple_steps_per_s" in ref:
        out["simple_agent_vs_ref_same_host"] = round(
            simple_sps / ref["ref_same_host_simple_steps_per_s"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
