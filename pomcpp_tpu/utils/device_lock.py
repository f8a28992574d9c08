"""Advisory single-client lock for the remote TPU tunnel.

The axon PJRT tunnel serves exactly ONE client process; opening a second
client while another holds the device has twice wedged the relay for
20 min - 1.5 h+ (every subsequent device op hangs; nothing on this VM can
restart the remote side).  The reference framework never faces this — its
Environment is in-process (/root/reference/src/bboard/environment.cpp) —
but any TPU deployment with an exclusive device attachment does, so the
serialization lives here as a first-class utility rather than folklore in
a working-notes file.

``tpu_client_lock`` is a cooperative ``flock`` on a well-known path that
every TPU-facing entry point (bench.py, scripts/validate_chunk_tpu.py,
the profile_* scripts) takes BEFORE its first device op:

* if the lock is free it is taken immediately (the common case);
* if another client holds it, we WAIT (polling) up to ``timeout_s`` —
  waiting IS the desired serialization ("sh -c 'a; b'" made automatic);
* on timeout we proceed anyway with a loud warning: an advisory lock
  must never convert a stale-holder bug into a zero-result round.

The lock is released by the OS when the process exits, so crashes cannot
leave it stuck (the file itself persisting is fine — only the flock
matters).  CPU-only runs (tests force ``jax_platforms=cpu``) skip the
lock entirely.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time
from contextlib import contextmanager

LOCK_PATH = "/tmp/pommer_tpu_client.lock"


def _tpu_possible() -> bool:
    """True when this process may open the real TPU client.

    The authoritative signal is ``jax.config.jax_platforms`` — the axon
    sitecustomize's register() sets it to ``"axon,cpu"`` (overriding any
    ``JAX_PLATFORMS`` env var, measured), and CPU-only code pins it to
    ``"cpu"`` in-process (conftest does).  TPU is ruled out only when the
    PREFERRED (first) platform is cpu; an "axon,cpu" preference list or
    an unreadable config means the TPU client may open — lock.
    """
    try:
        import jax

        plats = jax.config.jax_platforms
    except Exception:
        plats = None
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip() if plats else ""
    return first != "cpu"


@contextmanager
def tpu_client_lock(timeout_s: float = 900.0, poll_s: float = 2.0,
                    path: str = LOCK_PATH):
    """Hold the advisory TPU-client flock for the duration of the block.

    Acquire before the first jax device op.  No-op when the process is
    pinned to CPU.  Yields True if the lock was actually held, False if
    it was skipped (CPU) or timed out (proceed-with-warning).
    """
    if not _tpu_possible():
        yield False
        return

    fd, held = _acquire(path, timeout_s, poll_s)
    try:
        yield held
    finally:
        if held:
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def hold_tpu_client_lock(timeout_s: float = 900.0, poll_s: float = 2.0,
                         path: str = LOCK_PATH) -> bool:
    """Script-entry form: acquire the lock and hold it until process exit.

    The fd is deliberately leaked — the OS drops the flock when the
    process dies (including ``os._exit`` from watchdogs and SIGKILL), so
    no cleanup path is needed.  Returns True if the lock is held.
    """
    if not _tpu_possible():
        return False
    fd, held = _acquire(path, timeout_s, poll_s)
    os.set_inheritable(fd, False)
    return held


def _acquire(path: str, timeout_s: float, poll_s: float):
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
    deadline = time.monotonic() + timeout_s
    held = False
    warned = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            held = True
            break
        except BlockingIOError:
            if time.monotonic() >= deadline:
                print(
                    f"WARNING: TPU client lock {path} still held after "
                    f"{timeout_s:.0f}s; proceeding UNSERIALIZED (risk: "
                    "tunnel wedge)", file=sys.stderr, flush=True,
                )
                break
            if not warned:
                print(
                    f"waiting for TPU client lock {path} (another TPU "
                    "process is active)...", file=sys.stderr, flush=True,
                )
                warned = True
            time.sleep(poll_s)
    if held:
        try:
            os.ftruncate(fd, 0)
            os.write(fd, f"pid={os.getpid()}\n".encode())
        except OSError:
            pass
    return fd, held
