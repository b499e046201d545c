"""Overlay the b1 (reference update shape) A2C curves: continuous-Adam seeds
0/1/2, the adam-restart probe seeds 10/11, and the reference's shipped
A2C_GCN trailing-average curve — the evidence figure for ROUND4.md §2.

Usage: python scripts/plot_b1_band.py [--out data/eval/a2c_b1_band.png]
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

CURVES = [
    ("data/ckpt/a2c_gcn_map40_b1/temp_reward.csv", "seed 0 (64k)", "#2a78d6"),
    ("data/ckpt/a2c_gcn_map40_b1s1/temp_reward.csv", "seed 1", "#5d9be0"),
    ("data/ckpt/a2c_gcn_map40_b1s2/temp_reward.csv", "seed 2", "#9cc1ec"),
    ("data/ckpt/a2c_b1_adamrestart_s10/temp_reward.csv",
     "seed 10 + adam-restart 10k", "#1baf7a"),
    ("data/ckpt/a2c_b1_adamrestart_s11/temp_reward.csv",
     "seed 11 + adam-restart 10k", "#63cba4"),
    ("data/ckpt/a2c_b1_entropy_s12/temp_reward.csv", "seed 12", "#c5d6ea"),
    ("data/ckpt/a2c_b1_entgrad_s13/temp_reward.csv",
     "seed 13 + entropy-grad", "#eda100"),
]
REF = ("data/ref_curves/A2C_GCN_avg_reward.csv", "reference A2C_GCN", "#eb6834")


def read_curve(path, skip_header=False):
    xs, ys = [], []
    with open(path, newline="") as f:
        for i, row in enumerate(csv.reader(f)):
            if not row or (skip_header and i == 0) or not row[0][0].isdigit():
                continue
            xs.append(float(row[0]))
            ys.append(float(row[1]))
    return np.asarray(xs), np.asarray(ys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/eval/a2c_b1_band.png")
    ap.add_argument("--xmax", type=float, default=66000)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8.2, 4.6), dpi=140)
    rx, ry = read_curve(REF[0], skip_header=True)
    m = rx <= args.xmax
    ax.plot(rx[m], ry[m], color=REF[2], lw=2.2, label=REF[1], zorder=5)
    for path, label, color in CURVES:
        if not os.path.exists(path):
            continue
        xs, ys = read_curve(path)
        m = xs <= args.xmax
        ax.plot(xs[m], ys[m], color=color, lw=1.3, label=label)
    ax.axhline(0.0, color="#c8c8c8", lw=0.8, zorder=0)
    ax.set_xlabel("decision steps")
    ax.set_ylabel("trailing-1000 average reward")
    ax.set_title(
        "A2C+GCN at the reference's update shape (one env, update every 40)"
    )
    ax.legend(loc="lower right", fontsize=8, frameon=False)
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
