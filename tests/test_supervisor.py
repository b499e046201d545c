"""tools/train_supervisor.py: failure detection + elastic restart.

The aux-subsystem contract (SURVEY.md §5 "failure detection / elastic
recovery"): a trainer that stops making progress is killed and relaunched
from the last checkpoint; the restart budget bounds the loop; a clean exit
ends supervision.  Exercised here with a stub trainer script so no XLA
compile is involved.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUPERVISOR = os.path.join(REPO, "tools", "train_supervisor.py")

STALLING_TRAINER = """\
import argparse, os, time
ap = argparse.ArgumentParser()
ap.add_argument("--out-dir", required=True)
ap.add_argument("--resume", default=None)
args, _ = ap.parse_known_args()
with open(os.path.join(args.out_dir, "runs.txt"), "a") as f:
    f.write(f"resume={args.resume}\\n")
with open(os.path.join(args.out_dir, "trainer_state.msgpack"), "ab") as f:
    f.write(b"ckpt")
print("x" * 4000, flush=True)  # real progress, then stall forever
time.sleep(600)
"""

CLEAN_TRAINER = """\
import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--out-dir", required=True)
ap.add_argument("--resume", default=None)
ap.parse_known_args()
print("done", flush=True)
"""


def _run_supervisor(tmp_path, trainer_src, max_restarts, timeout=60.0):
    stub = tmp_path / "stub_trainer.py"
    stub.write_text(trainer_src)
    out_dir = tmp_path / "run"
    r = subprocess.run(
        [
            sys.executable,
            SUPERVISOR,
            "--out-dir", str(out_dir),
            "--trainer", str(stub),
            # first-stall must cover interpreter startup (>1 s cold on a
            # loaded/cold-cache host — with 1.0 s the supervisor kills the
            # stub before it prints, flaking all three tests); the stubs
            # print immediately after startup, so the post-progress window
            # (--stall-sec) is what the stall test actually measures
            "--stall-sec", "1.0",
            "--first-stall-sec", "15.0",
            "--poll-sec", "0.3",
            "--restart-delay-sec", "0.1",
            "--max-restarts", str(max_restarts),
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    return r, out_dir


def test_supervisor_kills_stalled_trainer_and_resumes(tmp_path):
    r, out_dir = _run_supervisor(tmp_path, STALLING_TRAINER, max_restarts=2)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "restart #1" in r.stdout
    assert "restart budget exhausted" in r.stdout

    runs = (out_dir / "runs.txt").read_text().splitlines()
    # initial launch + 2 restarts
    assert len(runs) == 3, runs
    # first launch starts fresh; every restart resumes from the checkpoint
    assert runs[0] == "resume=None"
    ckpt = str(out_dir / "trainer_state.msgpack")
    assert runs[1] == f"resume={ckpt}"
    assert runs[2] == f"resume={ckpt}"


def test_supervisor_returns_on_clean_exit(tmp_path):
    r, _ = _run_supervisor(tmp_path, CLEAN_TRAINER, max_restarts=2)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "training finished" in r.stdout
    assert "restart" not in r.stdout


SLOW_COMPILE_TRAINER = """\
import argparse, time
ap = argparse.ArgumentParser()
ap.add_argument("--out-dir", required=True)
ap.add_argument("--resume", default=None)
ap.parse_known_args()
time.sleep(2.5)  # a silent 'XLA compile' longer than --stall-sec
print("x" * 4000, flush=True)
"""


def test_supervisor_measures_progress_relative_to_restart_baseline(tmp_path):
    """The train.log accumulates across restarts; a big inherited log must
    not count as progress, or a silent compile's window collapses from
    --first-stall-sec to --stall-sec and the compile is kill-looped."""
    stub = tmp_path / "stub_trainer.py"
    stub.write_text(SLOW_COMPILE_TRAINER)
    out_dir = tmp_path / "run"
    out_dir.mkdir()
    # a previous incarnation already filled the log well past the absolute
    # progress threshold
    (out_dir / "train.log").write_bytes(b"y" * 9000)
    r = subprocess.run(
        [
            sys.executable,
            SUPERVISOR,
            "--out-dir", str(out_dir),
            "--trainer", str(stub),
            "--stall-sec", "1.0",
            "--first-stall-sec", "20.0",
            "--poll-sec", "0.3",
            "--restart-delay-sec", "0.1",
            "--max-restarts", "1",
        ],
        capture_output=True,
        text=True,
        timeout=60.0,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # the silent 2.5 s 'compile' must survive the 1 s stall window because
    # no NEW output appeared — the inherited 9 kB is not progress
    assert "training finished" in r.stdout
    assert "stall" not in r.stdout, r.stdout


def test_train_seed_rows_roundtrip(tmp_path):
    """Resume must extend the previous segment's CSVs, not clobber them."""
    from drl_graph_exploration_tpu.train import _seed_rows

    p = tmp_path / "temp_reward.csv"
    p.write_text("100,-0.5\n200,-0.25\n")
    assert _seed_rows(str(p)) == [(100, -0.5), (200, -0.25)]

    r = tmp_path / "reward_data.csv"
    r.write_text("Step,Reward\n1,-0.9\n2,-0.8\n")
    assert _seed_rows(str(r), skip_header=True) == [(1, -0.9), (2, -0.8)]

    assert _seed_rows(str(tmp_path / "missing.csv")) == []
