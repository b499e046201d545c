"""Yield the TPU chip to an end-of-round ``bench.py`` run.

The driver benchmarks the repo on the real chip at the end of every round.
``bench.py`` acquires the flock chip lock (utils/chiplock.py) and waits
forever, so a long eval/training job holding the lock at that moment would
stall the round's headline artifact (BENCH_rNN.json).  This watchdog closes
that hazard:

* every few seconds it scans ``/proc/*/cmdline`` for a ``bench.py`` process
  that is not a child of ours;
* on first detection it touches ``/tmp/chip_yield`` (the round-4 window
  script treats the sentinel as deadline-now and starts no further chip
  jobs), then frees the chip by stopping the current lock holder — via
  ``tools/stop_training.py`` when the holder is the supervised trainer
  (graceful SIGTERM -> checkpoint-save -> no restart), or a direct SIGTERM
  to the exact pid recorded in the lock file otherwise.

No process is ever signalled by name/pattern matching: the only pid we
signal is the one written into the lock file by its holder.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drl_graph_exploration_tpu.utils import chiplock  # noqa: E402


def find_bench_pid() -> int:
    """Pid of a running ``bench.py`` python process, or 0."""
    me = os.getpid()
    for ent in os.listdir("/proc"):
        if not ent.isdigit() or int(ent) == me:
            continue
        try:
            with open(f"/proc/{ent}/cmdline", "rb") as f:
                argv = f.read().split(b"\0")
        except OSError:
            continue
        if any(a.endswith(b"bench.py") for a in argv) and argv and (
            b"python" in argv[0] or argv[0].endswith(b"python3")
        ):
            return int(ent)
    return 0


def holder_pid() -> int:
    desc = chiplock.holder()
    if "pid=" not in desc:
        return 0
    try:
        return int(desc.rsplit("pid=", 1)[1].split()[0])
    except ValueError:
        return 0


def main() -> None:
    print("[bench_yield] watching for an end-of-round bench.py", flush=True)
    while True:
        bench = find_bench_pid()
        if bench:
            desc = chiplock.holder()
            hp = holder_pid()
            print(
                f"[bench_yield] bench.py pid {bench} detected; "
                f"lock holder: {desc!r}",
                flush=True,
            )
            # Stop the window/eval pipeline from taking the lock again.
            with open("/tmp/chip_yield", "w") as f:
                f.write(f"bench.py pid {bench} at {time.time():.0f}\n")
            if hp and hp != bench and _alive(hp):
                sup = 0
                try:
                    with open("/tmp/sup_dqn.pid") as f:
                        sup = int(f.read().strip())
                except (OSError, ValueError):
                    pass
                if desc.startswith("train:") and sup and _alive(sup):
                    print("[bench_yield] graceful trainer stop", flush=True)
                    subprocess.call(
                        [sys.executable, "tools/stop_training.py",
                         "--pid-file", "/tmp/sup_dqn.pid", "--grace", "240"]
                    )
                else:
                    print(f"[bench_yield] SIGTERM lock holder {hp}", flush=True)
                    try:
                        os.kill(hp, signal.SIGTERM)
                    except OSError as e:
                        print(f"[bench_yield] kill failed: {e!r}", flush=True)
            print("[bench_yield] done; exiting", flush=True)
            return
        time.sleep(10)


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


if __name__ == "__main__":
    main()
