"""Edge-count distribution of the replay ring from a finished training run.

``rl/replay.SparseGraph`` stores up to ``edge_cap`` (default 4096) top-k
edges per graph; ``densify_mm``'s (N, E) @ (E, N) contraction, the one-hot
build, the replay ring's memory and the per-update sample gathers all scale
linearly with that cap.  This tool answers "how many edges do graphs at the
shipping training config ACTUALLY have" from the durably saved
``trainer_state.msgpack`` of a real run (e.g. the completed 1e6-decision
DQN+GCN run), so the cap can be set from data instead of worst-case fear.

An edge slot is real iff its weight is nonzero: ``sparsify`` top_k pads the
tail with zero-weight entries once the true edge list is exhausted (the
adjacency it reads is thresholded, so genuine edges have strictly positive
weight).

Usage: python tools/edge_stats.py runs/dqn_gcn_map40_r3/trainer_state.msgpack
"""

import sys

import numpy as np
from flax import serialization


def walk(tree, path=()):
    """Yield (path, leaf) for every array leaf in a msgpack_restore tree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from walk(v, path + (k,))
    else:
        yield path, tree


def main(path: str) -> None:
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    found = False
    for p, leaf in walk(tree):
        if "edge_w" not in p[-1:]:
            continue
        arr = np.asarray(leaf)
        if arr.ndim != 2:
            continue
        found = True
        counts = (arr != 0).sum(axis=1)
        cap = arr.shape[1]
        q = np.percentile(counts, [50, 90, 99, 99.9, 100])
        print(f"{'/'.join(p)}: {arr.shape[0]} graphs, edge cap {cap}")
        print(
            f"  real edges per graph: p50={q[0]:.0f} p90={q[1]:.0f} "
            f"p99={q[2]:.0f} p99.9={q[3]:.0f} max={q[4]:.0f}"
            f"  ({(counts == cap).sum()} graphs at cap)"
        )
    if not found:
        print("no (ring, E) edge_w arrays found — is this a trainer_state?")


if __name__ == "__main__":
    main(sys.argv[1])
