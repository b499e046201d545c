"""Summarize an evaluation CSV (for map sizes where the reference ships no
results CSV): per-step-cutoff means and the episode-finish distribution.

An episode's "finish step" is the first step whose metrics stop changing
(the evaluator pads after done with the final value, mirroring the
reference's ``test.py:146-151``).

Usage:
    python scripts/summarize_eval.py data/eval/60_DQN_GCN.csv --steps 300 600 1200
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--steps", type=int, nargs="+", default=[300])
    args = ap.parse_args()

    episodes: dict[int, list[dict]] = defaultdict(list)
    times: list[float] = []
    ep = -1
    with open(args.csv, newline="") as f:
        for row in csv.DictReader(f):
            if row.get("Computation time"):
                # one cell per decision (single-episode layout) or a repeated
                # constant (batched layout); either way the mean is the
                # per-decision policy latency
                times.append(float(row["Computation time"]))
            if not row["Step"]:
                continue
            if int(float(row["Step"])) == 1 or ep < 0:
                ep += 1
            episodes[ep].append(row)

    if not episodes:
        print(f"{args.csv}: no metric rows")
        return
    n = len(episodes)
    lens = sorted(len(r) for r in episodes.values())
    print(f"{args.csv}: {n} episodes, {lens[0]}-{lens[-1]} steps each")

    finishes = []
    for rows in episodes.values():
        last = rows[-1]
        keys = ("Map entropy", "Landmarks error", "Max localization uncertainty")
        fin = len(rows)
        for i in range(len(rows) - 1, 0, -1):
            if any(rows[i - 1][k] != last[k] for k in keys):
                fin = i + 1
                break
        finishes.append(fin)
    finishes.sort()
    print(
        f"finish steps: min {finishes[0]}  median {finishes[n // 2]}  "
        f"max {finishes[-1]}"
    )

    for s in args.steps:
        acc = defaultdict(float)
        cnt = 0
        for rows in episodes.values():
            if s - 1 < len(rows):
                r = rows[s - 1]
                for k in (
                    "Map entropy",
                    "Landmarks error",
                    "Max localization uncertainty",
                ):
                    acc[k] += float(r[k])
                cnt += 1
        if cnt:
            print(
                f"step {s:5d} (n={cnt}): "
                + "  ".join(f"{k}={v / cnt:.3f}" for k, v in acc.items())
            )
    if times:
        print(f"policy compute time: {sum(times) / len(times) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
