"""End-to-end config 4 (VERDICT r1 #7): train a fogged 2v2 team policy and
report team win rates through the real scripts.

Drives scripts/train_ppo.py --team (egocentric/fogged observations via
observe_ego, shared team rewards, team terminal detection) for a couple of
iterations, checkpoints, then runs scripts/evaluate.py --team with the
trained policy on one team vs scripted agents -- the full composition the
round-1 verdict flagged as missing.
"""

import json
import os
import re
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    env = dict(
        os.environ,
        PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""),
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run(
        [sys.executable] + args,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r.stdout


@pytest.mark.slow
def test_train_team_then_evaluate_team_winrates():
    ckpt = tempfile.mkdtemp()
    out = _run(
        ["scripts/train_ppo.py", "--team", "--cpu", "--batch", "4",
         "--iters", "2", "--rollout", "8", "--ckpt-dir", ckpt],
        timeout=600,
    )
    # Train emits one JSON metrics line per iteration.
    metrics = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(metrics) == 2 and "loss" in metrics[0]
    assert os.path.exists(os.path.join(ckpt, "checkpoint.npz"))

    out = _run(
        ["scripts/evaluate.py", "--team", "--cpu", "--games", "8",
         "--steps", "40", "--agents", "ppo,random,ppo,random",
         "--ckpt", ckpt],
        timeout=600,
    )
    # Team win-rate report: team0 is the ppo pair, team1 the random pair.
    assert re.search(r"team0\(ppo\+ppo\)|team1\(random\+random\)|draw|timeout", out), out
