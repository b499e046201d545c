"""Rolling-average training-reward curves (reference ``data/plot_ave_reward.py``):
plot the trailing-average reward written by ``train.py`` (``temp_reward.csv``,
columns step,avg_reward) for one or more runs."""
import argparse
import csv
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+", help="temp_reward.csv files")
    ap.add_argument("--labels", nargs="*", default=None)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--out", default="ave_reward.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # default label: the run directory name; bare filenames fall back to the
    # filename itself rather than crashing on a missing path component
    labels = list(args.labels or [])
    labels += [
        os.path.basename(os.path.dirname(os.path.abspath(p)) ) or os.path.basename(p)
        for p in args.csvs[len(labels):]
    ]
    for path, label in zip(args.csvs, labels):
        rows = np.array(
            [[float(a), float(b)] for a, b in csv.reader(open(path))]
        )
        if len(rows) > args.window:
            kernel = np.ones(args.window) / args.window
            smooth = np.convolve(rows[:, 1], kernel, mode="valid")
            plt.plot(rows[args.window - 1 :, 0], smooth, label=label)
        else:
            plt.plot(rows[:, 0], rows[:, 1], label=label)
    plt.xlabel("training step")
    plt.ylabel("average reward")
    plt.legend()
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
