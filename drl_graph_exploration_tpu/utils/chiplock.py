"""Mutual exclusion for the single (tunneled) TPU chip.

Round 3 lost ~4 h of chip time to ad-hoc shell choreography: eval scripts
killed the trainer by pid file faster than its checkpoint cadence, so the
same ~6k decisions were re-trained after every kill (VERDICT r3, weak #1).
The fix is a plain ``flock``: every chip user — trainer, evaluator, bench,
profilers — acquires ``/tmp/tpu_chip.lock`` exclusively before creating the
TPU backend and holds it for the life of the process (the OS releases the
lock on any exit, including SIGKILL, so there is no stale-lock failure mode).

Callers that want the chip politely stop the trainer first
(``tools/stop_training.py`` — SIGTERM → checkpoint-save → exit 0), then
block here until the lock frees.  CPU-only runs never touch the lock.
"""

from __future__ import annotations

import fcntl
import os
import time

LOCK_PATH = os.environ.get("TPU_CHIP_LOCK", "/tmp/tpu_chip.lock")

_held = []  # keep fds alive for the process lifetime


def acquire(tag: str, path: str = "", timeout: float = 0.0, poll: float = 5.0):
    """Block until this process holds the exclusive chip lock.

    ``tag`` (e.g. ``"train:dqn_gcn_map40"``) is written into the lock file so
    a waiter can print who holds the chip.  ``timeout`` 0 waits forever.
    Returns the open fd (also retained in ``_held``); re-acquiring in the
    same process is a no-op (flock is per-open-file, but we only open once).
    """
    if _held:
        return _held[0]
    path = path or LOCK_PATH
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o666)
    t0 = time.time()
    warned = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except BlockingIOError:
            if timeout and time.time() - t0 > timeout:
                os.close(fd)
                raise TimeoutError(
                    f"chip lock {path} still held by {holder(path)!r} "
                    f"after {timeout:.0f}s"
                )
            if not warned:
                print(
                    f"[chiplock] waiting for {path} "
                    f"(held by {holder(path)!r}) ...",
                    flush=True,
                )
                warned = True
            time.sleep(poll)
    # Tunnel-teardown grace: give the previous holder's client slot a few
    # seconds to clear before the caller initialises the backend — a failed
    # init deregisters the plugin for the process lifetime, so one early
    # probe would kill the whole run.  (Belt-and-braces: the one failure
    # mode actually observed so far was a clobbered PYTHONPATH dropping the
    # plugin's site dir, not this race — but the race is real in principle
    # and 10 s is free next to any chip job.)
    if holder(path):
        time.sleep(float(os.environ.get("TPU_CHIP_LOCK_GRACE", "10")))
    os.ftruncate(fd, 0)
    os.pwrite(fd, f"{tag} pid={os.getpid()}".encode(), 0)
    _held.append(fd)
    return fd


def holder(path: str = "") -> str:
    """Best-effort description of the current lock holder."""
    path = path or LOCK_PATH
    try:
        with open(path) as f:
            return f.read().strip()
    except OSError:
        return ""


def acquire_if_tpu(tag: str, timeout: float = 0.0):
    """Acquire the lock only when the ambient backend is a real accelerator.

    TPU-ness is decided from ``JAX_PLATFORMS`` WITHOUT initialising the
    backend: the tunneled chip admits one client, so probing it while another
    process holds the chip fails backend discovery outright (the plugin drops
    out of the known-backends list).  Lock first, init after — the round-4b
    profiler hit exactly this race against a running evaluator.
    """
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and all(
        p.strip() in ("cpu", "") for p in platforms.split(",")
    ):
        return None  # explicitly CPU-pinned (tests, host-side trainers)
    return acquire(tag, timeout=timeout)
