"""Durable training snapshots: periodically copy run artifacts into a
git-tracked directory and commit them.

Round 2 lost a 340k-decision training run because checkpoints lived only
under the gitignored ``runs/`` and the round boundary checked out the
committed tree (VERDICT r2, Missing #1).  This loop makes progress durable:
every ``--interval`` seconds it copies the small artifacts (params, slim
learner state, reward curves, a log tail) from ``--run-dir`` into
``--dest`` and commits exactly those paths.

The full ``trainer_state.msgpack`` (~1 GB with the replay ring) is NOT
committed; ``slim_state.msgpack`` (params + target/critic + opt state +
step_t) is enough to continue training across a checkout via
``train.py --resume-slim`` with a fresh replay warm-up.

Safe next to interactive git use: commits name their pathspec explicitly
(``git commit -- <dest>``) so concurrently staged files are untouched, and
index.lock contention is retried.

Usage:
    python tools/durable_commit.py --run-dir runs/dqn_gcn_map40 \
        --dest data/ckpt/dqn_gcn_map40 --interval 900
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
import subprocess
import time

ARTIFACTS = (
    "MyModel.msgpack",
    "slim_state.msgpack",
    "temp_reward.csv",
    "reward_data.csv",
    "temp_loss.csv",
)


def last_step(dest: str) -> str:
    try:
        with open(os.path.join(dest, "temp_reward.csv"), newline="") as f:
            rows = list(csv.reader(f))
        return rows[-1][0] if rows else "?"
    except Exception:  # noqa: BLE001 - label only
        return "?"


def git(repo: str, *args: str, retries: int = 5) -> bool:
    for i in range(retries):
        r = subprocess.run(
            ["git", "-C", repo, *args], capture_output=True, text=True
        )
        if r.returncode == 0:
            return True
        if "index.lock" in r.stderr and i < retries - 1:
            time.sleep(2.0 * (i + 1))
            continue
        print(f"[durable] git {' '.join(args[:2])} failed: {r.stderr.strip()[:300]}",
              flush=True)
        return False
    return False


def snapshot(run_dir: str, dest: str, repo: str, log_tail_kb: int) -> bool:
    os.makedirs(dest, exist_ok=True)
    changed = False
    for name in ARTIFACTS:
        src = os.path.join(run_dir, name)
        dst = os.path.join(dest, name)
        if not os.path.exists(src):
            continue
        if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
            continue
        shutil.copy2(src, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
        changed = True
    log = os.path.join(run_dir, "train.log")
    if os.path.exists(log):
        with open(log, "rb") as f:
            f.seek(max(0, os.path.getsize(log) - log_tail_kb * 1024))
            tail = f.read()
        with open(os.path.join(dest, "train.log.tail"), "wb") as f:
            f.write(tail)
        changed = True
    if not changed:
        return False
    rel = os.path.relpath(dest, repo)
    if not git(repo, "add", "--", rel):
        return False
    # content-identical copies (e.g. only the log tail was rewritten with the
    # same bytes) would make an empty commit — skip them
    probe = subprocess.run(
        ["git", "-C", repo, "diff", "--cached", "--quiet", "--", rel]
    )
    if probe.returncode == 0:
        return False
    # commit only the snapshot pathspec so concurrently staged work is safe
    msg = f"training snapshot: {os.path.basename(dest)} step {last_step(dest)}"
    return git(repo, "commit", "-q", "-m", msg, "--", rel)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--dest", required=True)
    ap.add_argument("--interval", type=float, default=900.0)
    ap.add_argument("--log-tail-kb", type=int, default=64)
    ap.add_argument("--once", action="store_true", help="one snapshot, then exit")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    while True:
        try:
            if snapshot(args.run_dir, args.dest, repo, args.log_tail_kb):
                print(f"[durable] committed snapshot step {last_step(args.dest)}",
                      flush=True)
        except Exception as e:  # noqa: BLE001 - the loop must outlive blips
            print(f"[durable] snapshot failed: {e!r}", flush=True)
        if args.once:
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
