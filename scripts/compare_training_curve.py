"""Training reward-curve comparison: our run vs the reference's shipped curves.

The reference logs a trailing-average reward every 100 decision steps over a
1e6-step schedule (``/root/reference/scripts/policy.py:194-207``, TensorBoard
relay ``train.py:85-94``).  Our ``train.py`` writes the same quantity to
``temp_reward.csv``.  The reference snapshot ships tfevents for the A2C runs
only (the DQN logs are pruned, ``/root/reference/.MISSING_LARGE_BLOBS``);
``data/ref_curves/*.csv`` are their extracted scalars.

Usage:
    python scripts/compare_training_curve.py runs/dqn_gcn_map40/temp_reward.csv \
        --label "DQN+GCN (ours, TPU)" --out data/eval/training_curve.png
"""

from __future__ import annotations

import argparse
import csv
import glob
import os

import numpy as np

# dataviz categorical palette (fixed slot order: ours first, then references)
COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]


def read_curve(path: str) -> tuple[np.ndarray, np.ndarray]:
    steps, vals = [], []
    with open(path, newline="") as f:
        r = csv.reader(f)
        for row in r:
            if not row or not row[0].strip() or not row[0][0].isdigit():
                continue
            steps.append(float(row[0]))
            vals.append(float(row[1]))
    return np.asarray(steps), np.asarray(vals)


def smooth(vals: np.ndarray, window: int) -> np.ndarray:
    """Trailing mean with a partial window at the head (so early-training
    dynamics plot as their true running mean, not a flat pad)."""
    if window <= 1 or len(vals) < 2:
        return vals
    c = np.concatenate([[0.0], np.cumsum(vals)])
    i = np.arange(1, len(vals) + 1)
    lo = np.maximum(i - window, 0)
    return (c[i] - c[lo]) / (i - lo)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours", nargs="+",
                    help="our temp_reward.csv file(s), one curve each")
    ap.add_argument("--label", action="append", default=None,
                    help="label per positional curve (repeatable)")
    ap.add_argument("--ref-dir", default="data/ref_curves")
    ap.add_argument("--window", type=int, default=100,
                    help="rolling-mean window over the logged points "
                         "(the reference paper plot uses 10k raw steps = 100 points)")
    ap.add_argument("--out", default="training_curve.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)

    labels = args.label or []
    labels += [
        f"ours #{i + 1}" for i in range(len(labels), len(args.ours))
    ]
    # solid heavier lines for our runs; dashed thin for reference curves —
    # color alone must not carry the ours/reference distinction
    for i, (path, label) in enumerate(zip(args.ours, labels)):
        steps, vals = read_curve(path)
        if len(steps) == 0:
            raise SystemExit(
                f"no curve data in {path} yet (train.py appends rows only "
                "after step_t > 1000)"
            )
        sm = smooth(vals, args.window)
        ax.plot(steps, sm, color=COLORS[i % len(COLORS)], lw=2, label=label,
                zorder=3)
        print(f"{label}: {int(steps[-1])} steps, "
              f"trailing avg {vals[-1]:+.3f} (smoothed {sm[-1]:+.3f})")

    n_ours = len(args.ours)
    for i, path in enumerate(sorted(glob.glob(os.path.join(args.ref_dir, "*.csv")))):
        name = os.path.basename(path).replace("_avg_reward.csv", "")
        rs, rv = read_curve(path)
        ax.plot(rs, smooth(rv, args.window),
                color=COLORS[(n_ours + i) % len(COLORS)],
                lw=1.2, ls="--", alpha=0.9, label=f"{name} (reference)")
        print(f"{name} (reference): final {rv[-1]:+.3f} at step {int(rs[-1])}")

    ax.set_xlabel("decision steps")
    ax.set_ylabel("trailing-average reward")
    ax.set_title("Training reward vs reference shipped curves (map 40)")
    ax.grid(True, alpha=0.25, lw=0.5)
    ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
