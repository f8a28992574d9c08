"""Advisory TPU-client lock (pomcpp_tpu/utils/device_lock.py).

The lock serializes TPU-facing entry points on one host so a second
client can never open the exclusive device attachment mid-run (the
documented tunnel-wedge trigger).  These tests run lock mechanics only —
no jax, no device.
"""

from __future__ import annotations

import fcntl
import os
import subprocess
import sys

from pomcpp_tpu.utils import device_lock
from pomcpp_tpu.utils.device_lock import tpu_client_lock


def test_lock_acquired_and_released(tmp_path, monkeypatch):
    # The test process is CPU-pinned (conftest), which normally skips the
    # lock; force the TPU path to exercise the mechanics.
    monkeypatch.setattr(device_lock, "_tpu_possible", lambda: True)
    path = str(tmp_path / "lk")
    with tpu_client_lock(path=path, timeout_s=5) as held:
        assert held
        # A second taker in another PROCESS must see it busy (flock is
        # per-open-file-description, so the probe must not share ours).
        probe = subprocess.run(
            [sys.executable, "-c",
             "import fcntl,os,sys\n"
             f"fd=os.open({path!r}, os.O_RDWR)\n"
             "try:\n"
             "    fcntl.flock(fd, fcntl.LOCK_EX|fcntl.LOCK_NB)\n"
             "    sys.exit(1)\n"
             "except BlockingIOError:\n"
             "    sys.exit(0)\n"],
            timeout=30,
        )
        assert probe.returncode == 0, "lock not visible to a second process"
    # Released after the block: now acquirable.
    fd = os.open(path, os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    os.close(fd)


def test_lock_timeout_proceeds_with_warning(tmp_path, monkeypatch):
    monkeypatch.setattr(device_lock, "_tpu_possible", lambda: True)
    path = str(tmp_path / "lk")
    holder = subprocess.Popen(
        [sys.executable, "-c",
         "import fcntl,os,sys,time\n"
         f"fd=os.open({path!r}, os.O_CREAT|os.O_RDWR, 0o666)\n"
         "fcntl.flock(fd, fcntl.LOCK_EX)\n"
         "print('held', flush=True)\n"
         "time.sleep(60)\n"],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "held"
        with tpu_client_lock(path=path, timeout_s=1, poll_s=0.2) as held:
            assert held is False  # timed out -> proceed unserialized
    finally:
        holder.kill()
        holder.wait()


def test_cpu_pinned_process_skips_lock(tmp_path):
    # A process that pinned jax to CPU must not touch the lock at all.
    path = str(tmp_path / "lk")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax\n"
         "jax.config.update('jax_platforms', 'cpu')\n"
         "from pomcpp_tpu.utils.device_lock import tpu_client_lock\n"
         f"with tpu_client_lock(path={path!r}) as held:\n"
         "    assert held is False\n"
         "import os; assert not os.path.exists({!r})\n".format(path)],
        timeout=120, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
