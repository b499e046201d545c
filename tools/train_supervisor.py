"""Training supervisor: failure detection + elastic restart.

The reference restarts training subprocesses every epoch to firewall a C++
memory leak (``train.py:82-84``); our functional trainer doesn't leak, but
the tunneled TPU backend occasionally wedges a dispatch indefinitely.  This
supervisor launches ``drl_graph_exploration_tpu.train``, watches the log for
progress, and on stall (no new decision line for ``--stall-sec``) kills the
run and resumes it from the last checkpoint (``trainer_state.msgpack``
carries params, optimizer, replay, envs and counters).

Usage: python tools/train_supervisor.py --out-dir runs/x -- [train args...]
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def launch(train_args, out_dir, resume, log_path, trainer="drl_graph_exploration_tpu.train"):
    if trainer.endswith(".py"):
        head = [sys.executable, trainer]  # test stubs: a plain script path
    else:
        head = [sys.executable, "-m", trainer]
    cmd = [
        *head,
        *train_args,
        "--out-dir",
        out_dir,
    ]
    if resume:
        cmd += ["--resume", resume]
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    log = open(log_path, "ab")
    return subprocess.Popen(cmd, stdout=log, stderr=log, env=env)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--stall-sec", type=float, default=240.0)
    ap.add_argument("--first-stall-sec", type=float, default=3600.0,
                    help="stall window until the first decision line (cold "
                         "XLA compiles are silent and can take >30 min)")
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--trainer", default="drl_graph_exploration_tpu.train",
                    help="trainer module (or a .py script path, for tests)")
    ap.add_argument("--poll-sec", type=float, default=10.0)
    ap.add_argument("--restart-delay-sec", type=float, default=5.0)
    ap.add_argument("--progress-bytes", type=int, default=2048,
                    help="log growth that counts as real output, not banners")
    ap.add_argument("--grace-sec", type=float, default=180.0,
                    help="wait for the trainer's SIGTERM checkpoint-save "
                         "before escalating to SIGKILL")
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="arguments after -- go to the trainer")
    args = ap.parse_args()
    train_args = [a for a in args.train_args if a != "--"]

    # graceful shutdown (tools/stop_training.py): forward SIGTERM to the
    # trainer — its handler saves a full checkpoint and exits 0 — then exit
    # WITHOUT restarting.  This replaces round 3's kill-by-pid-file scripts
    # that lost up to ~6k decisions per preemption.
    stopping = {"flag": False}

    def _on_term(signum, frame):  # noqa: ARG001
        stopping["flag"] = True

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    def graceful_kill(proc, grace):
        """SIGTERM (checkpoint-save) -> grace wait -> SIGKILL."""
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=grace)
        except subprocess.TimeoutExpired:
            print("[supervisor] grace expired — SIGKILL", flush=True)
            proc.send_signal(signal.SIGKILL)
            proc.wait()

    os.makedirs(args.out_dir, exist_ok=True)
    log_path = os.path.join(args.out_dir, "train.log")
    ckpt = os.path.join(args.out_dir, "trainer_state.msgpack")

    restarts = 0
    def log_size():
        return os.path.getsize(log_path) if os.path.exists(log_path) else 0

    proc = launch(train_args, args.out_dir, None, log_path, args.trainer)
    # progress is measured RELATIVE to the log size at (re)launch: the log
    # accumulates across restarts, so an absolute-size check would flip
    # saw_progress on banner output alone and shrink a silent XLA compile's
    # window from --first-stall-sec to --stall-sec, kill-looping the compile
    base_size = log_size()
    last_size = -1
    last_progress = time.time()
    saw_progress = False
    while True:
        time.sleep(args.poll_sec)
        if stopping["flag"]:
            print("[supervisor] stop requested — graceful trainer shutdown",
                  flush=True)
            if proc.poll() is None:
                graceful_kill(proc, args.grace_sec)
            print(f"[supervisor] stopped (trainer exit {proc.poll()})",
                  flush=True)
            return
        ret = proc.poll()
        if ret is not None:
            if ret == 0:
                print("[supervisor] training finished", flush=True)
                return
            print(f"[supervisor] trainer exited {ret}", flush=True)
        else:
            size = log_size()
            if size != last_size:
                if (
                    size - max(last_size, base_size) > args.progress_bytes
                    or size - base_size > 4 * args.progress_bytes
                ):
                    saw_progress = True  # real output, not just banners
                last_size = size
                last_progress = time.time()
            window = args.stall_sec if saw_progress else args.first_stall_sec
            if time.time() - last_progress < window:
                continue
            print(
                f"[supervisor] stall > {window}s — killing pid {proc.pid}",
                flush=True,
            )
            # a stalled trainer may still be able to run its SIGTERM
            # checkpoint-save (stalls are usually a wedged *dispatch*, the
            # Python loop wakes on the signal); only a short grace here —
            # if it is truly wedged the checkpoint cadence bounds the loss
            graceful_kill(proc, min(args.grace_sec, 60.0))

        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] restart budget exhausted", flush=True)
            return
        resume = ckpt if os.path.exists(ckpt) else None
        print(f"[supervisor] restart #{restarts} (resume={bool(resume)})", flush=True)
        time.sleep(args.restart_delay_sec)
        proc = launch(train_args, args.out_dir, resume, log_path, args.trainer)
        base_size = log_size()
        last_progress = time.time()
        last_size = -1
        saw_progress = False


if __name__ == "__main__":
    main()
