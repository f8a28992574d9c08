"""Resume-after-kill reproduces straight-through training bit-for-bit.

The reference has no persistence at all; our failure-recovery story is
checkpoint/resume (SURVEY.md §5, VERDICT r4 item 7).  These tests pin the
property that makes it a *recovery* story rather than a weights dump: a
training run killed at iteration k and resumed from the full bundle
(TrainState + env states + opponent FSM state + iteration index) emits
the SAME metrics as the uninterrupted run, leaf-for-leaf.

Two tiers:
 - in-process: drive ``ppo_train_step`` directly, save/restore the bundle
   mid-run through ``utils.checkpoint`` (fast, always on);
 - subprocess (slow): the real ``scripts/train_ppo.py`` CLI, kill between
   iterations by just running fewer of them, resume with ``--resume``,
   compare the printed JSON metric lines.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.env import env_reset
from pomcpp_tpu.learner import PPOConfig, ppo_init, ppo_train_step
from pomcpp_tpu.utils import restore_checkpoint, save_checkpoint

_CFG = PPOConfig(rollout_len=4, epochs=1, minibatches=2, opponent="simple",
                 learner_slots=(0,))


def _init(batch=8, seed=0):
    from pomcpp_tpu.learner.ppo import opponent_state_init

    ts = ppo_init(jax.random.PRNGKey(seed), _CFG)
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(seed + 1), batch)
    )
    opp = opponent_state_init(batch, _CFG)
    return ts, es, opp


def _metrics_eq(a, b):
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=f"metric {k}"
        )


def test_inprocess_resume_bit_match(tmp_path):
    step = jax.jit(lambda ts, es, opp: ppo_train_step(ts, es, _CFG, opp))

    # Straight-through: 4 iterations.
    ts_s, es_s, opp_s = _init()
    straight = []
    for _ in range(4):
        ts_s, es_s, m, opp_s = step(ts_s, es_s, opp_s)
        straight.append(jax.tree.map(np.asarray, m))

    # Interrupted: 2 iterations, checkpoint the bundle, "kill", restore
    # into FRESH objects, run 2 more.
    ts, es, opp = _init()
    for _ in range(2):
        ts, es, m, opp = step(ts, es, opp)
    save_checkpoint(str(tmp_path / "ck"), {"ts": ts, "es": es, "opp": opp})

    ts2, es2, opp2 = _init(seed=123)   # deliberately different seed
    bundle = restore_checkpoint(
        str(tmp_path / "ck"), {"ts": ts2, "es": es2, "opp": opp2}
    )
    ts2, es2, opp2 = bundle["ts"], bundle["es"], bundle["opp"]
    for i in (2, 3):
        ts2, es2, m, opp2 = step(ts2, es2, opp2)
        _metrics_eq(straight[i], jax.tree.map(np.asarray, m))

    # And the final states agree with the straight-through run entirely,
    # not just the metrics.
    for a, b in zip(jax.tree.leaves((ts_s, es_s, opp_s)),
                    jax.tree.leaves((ts2, es2, opp2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _run_train(tmp_path, iters, resume=False):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, os.path.join(repo, "scripts", "train_ppo.py"),
        "--cpu", "--batch", "8", "--iters", str(iters), "--rollout", "4",
        "--epochs", "1", "--minibatches", "2", "--opponent", "simple",
        "--learner-slots", "0", "--ckpt-dir", str(tmp_path / "ck"),
        "--ckpt-every", "2",
    ] + (["--resume"] if resume else [])
    env = dict(
        os.environ,
        PYTHONPATH=repo + ":" + os.environ.get("PYTHONPATH", ""),
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = []
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            rows.append(json.loads(line))
    return rows


_TIMING_KEYS = {"env_steps_per_s", "sec"}


@pytest.mark.slow
def test_cli_resume_bit_match(tmp_path):
    straight = _run_train(tmp_path / "a", iters=4)
    part1 = _run_train(tmp_path / "b", iters=2)
    part2 = _run_train(tmp_path / "b", iters=4, resume=True)
    assert [r["iter"] for r in part2] == [2, 3]
    resumed = part1 + part2
    assert len(straight) == len(resumed) == 4
    for s, r in zip(straight, resumed):
        for k in s:
            if k in _TIMING_KEYS:
                continue
            assert s[k] == r[k], (
                f"iter {s['iter']} metric {k}: straight {s[k]} != "
                f"resumed {r[k]}"
            )
