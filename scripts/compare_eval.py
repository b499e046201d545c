"""Compare an evaluation CSV produced by drl_graph_exploration_tpu.evaluate
against the reference's shipped results.

Reference CSVs: /root/reference/data/test_result/40_DQN_GCN.csv etc., schema
``scripts/test.py:124-125`` (Step, Category, Map entropy, Landmarks error,
Max localization uncertainty, Computation time, Map size).  Metrics compared
at a given step (default 300, the paper's map-40 reporting point) averaged
over episodes, plus mean policy compute time.

Usage:
    python scripts/compare_eval.py ours.csv /root/reference/data/test_result/40_DQN_GCN.csv \
        --step 300
"""

from __future__ import annotations

import argparse
import csv
from collections import defaultdict


def load(path: str):
    rows = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            rows.append(row)
    return rows


def at_step(rows, step: int):
    """Mean metrics over all rows with Step == step (one per episode)."""
    keys = ("Map entropy", "Landmarks error", "Max localization uncertainty")
    acc = defaultdict(list)
    for r in rows:
        if not r["Step"]:  # per-episode Computation-time rows have no Step
            continue
        if int(float(r["Step"])) == step:
            for k in keys:
                acc[k].append(float(r[k]))
    return {k: sum(v) / len(v) for k, v in acc.items() if v}, len(
        acc["Map entropy"]
    )


def mean_time(rows) -> float:
    """Mean of non-empty Computation time cells (the reference writes one
    such row per episode, metric rows leave the column empty)."""
    ts = [float(r["Computation time"]) for r in rows if r["Computation time"]]
    return sum(ts) / max(len(ts), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("reference")
    ap.add_argument("--step", type=int, default=300)
    args = ap.parse_args()

    ours = load(args.ours)
    ref = load(args.reference)
    m_ours, n_ours = at_step(ours, args.step)
    m_ref, n_ref = at_step(ref, args.step)

    print(f"metrics at step {args.step} (ours n={n_ours}, ref n={n_ref}):")
    print(f"{'metric':35s} {'ours':>10s} {'reference':>10s} {'delta':>8s}")
    for k in ("Map entropy", "Landmarks error", "Max localization uncertainty"):
        o, r = m_ours.get(k), m_ref.get(k)
        if o is None or r is None:
            continue
        print(f"{k:35s} {o:10.3f} {r:10.3f} {o - r:+8.3f}")
    to, tr = mean_time(ours) * 1e3, mean_time(ref) * 1e3
    print(f"{'Policy compute time (ms, mean)':35s} {to:10.2f} {tr:10.2f} {to - tr:+8.2f}")


if __name__ == "__main__":
    main()
