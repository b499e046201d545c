"""Wall-clock milestones of a training run vs the reference's shipped curves.

Reads a run's temp_reward.csv (trailing-1000 average reward every 100
decision steps — the reference's logging quantity, ``policy.py:200-203``)
plus its train.log timestamps, and reports when the curve first crosses the
levels the reference's shipped A2C curves cross, and when it first enters
*sustained* (>= N consecutive samples) the band the reference's final curves
live in.  Used for the BASELINE.md "<1 h to the paper's average-reward
curve" north-star statement.

Usage: python scripts/curve_milestones.py runs/dqn_gcn_map40_r3 [--band -0.1]
"""

from __future__ import annotations

import argparse
import csv
import os
import re


def load_curve(run_dir: str) -> list[tuple[int, float]]:
    with open(os.path.join(run_dir, "temp_reward.csv"), newline="") as f:
        return [(int(float(s)), float(v)) for s, v in csv.reader(f) if v]


def load_times(run_dir: str) -> list[tuple[int, float]]:
    """(step_t, wall_seconds_since_launch) from train.log decision lines."""
    out = []
    pat = re.compile(r"\[\s*([0-9.]+)s\] decision \d+ step_t (\d+)")
    path = os.path.join(run_dir, "train.log")
    if not os.path.exists(path):  # durable snapshots carry only the tail
        path = os.path.join(run_dir, "train.log.tail")
    if not os.path.exists(path):
        return []
    with open(path, errors="replace") as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append((int(m.group(2)), float(m.group(1))))
    return out


def wall_at(times: list[tuple[int, float]], step: int) -> float | None:
    for s, t in times:
        if s >= step:
            return t
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--band", type=float, default=-0.1,
                    help="sustained-entry threshold (reference A2C finals "
                    "live in [-0.1, +0.11]; see data/ref_curves)")
    ap.add_argument("--sustain", type=int, default=20,
                    help="consecutive samples (each 100 steps) to count as "
                    "sustained")
    args = ap.parse_args()

    curve = load_curve(args.run_dir)
    times = load_times(args.run_dir)
    if not curve:
        print("no curve rows yet")
        return

    for level in (-0.3, -0.2, -0.1, -0.05, 0.0):
        hit = next((s for s, v in curve if v >= level), None)
        w = wall_at(times, hit) if hit else None
        ws = f"{w / 60:.1f} min" if w is not None else "?"
        print(f"first avg_reward >= {level:+.2f}: step {hit}  wall {ws}")

    run = 0
    entered = None
    for s, v in curve:
        run = run + 1 if v >= args.band else 0
        if run >= args.sustain:
            entered = s - (args.sustain - 1) * 100
            break
    if entered is not None:
        w = wall_at(times, entered)
        ws = f"{w / 60:.1f} min" if w is not None else "?"
        print(f"sustained (>= {args.sustain} samples) entry above "
              f"{args.band:+.2f}: step {entered}  wall {ws}")
    else:
        print(f"not yet sustained above {args.band:+.2f} "
              f"(last: step {curve[-1][0]} avg {curve[-1][1]:+.3f})")


if __name__ == "__main__":
    main()
