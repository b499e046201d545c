"""Evaluation curves vs step (reference ``data/plot_test_step.py``): mean +/-
spread of map entropy / landmark error / max localization uncertainty over the
50 evaluation episodes produced by ``evaluate.py``."""
import argparse
import csv
from collections import defaultdict

import numpy as np

METRICS = ["Map entropy", "Landmarks error", "Max localization uncertainty"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("--max-step", type=int, default=400)
    ap.add_argument("--out", default="test_step.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(METRICS), figsize=(5 * len(METRICS), 4))
    for path in args.csvs:
        with open(path) as f:
            rows = list(csv.DictReader(f))
        per_step = defaultdict(lambda: defaultdict(list))
        label = rows[0]["Category"] if rows else path
        for row in rows:
            if not (row.get("Step") or "").strip():
                continue  # reference CSVs carry blank separator rows
            step = int(float(row["Step"]))
            if step > args.max_step:
                continue
            for m in METRICS:
                per_step[m][step].append(float(row[m]))
        for ax, m in zip(axes, METRICS):
            steps = sorted(per_step[m])
            mean = np.array([np.mean(per_step[m][s]) for s in steps])
            ax.plot(steps, mean, label=label)
            ax.set_xlabel("step")
            ax.set_ylabel(m)
    for ax in axes:
        ax.legend()
    plt.tight_layout()
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
