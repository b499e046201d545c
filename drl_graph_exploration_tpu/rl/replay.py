"""On-device replay ring buffer for graph transitions.

The reference keeps a 1e4-entry ``collections.deque`` of PyG ``Data`` objects
on the host (``/root/reference/scripts/policy.py:53,131-133``).  Here the
buffer is a fixed-capacity device-resident pytree; graphs are stored with
**sparsified adjacency** (top-K upper-triangle edges, f16 weights) so 1e4
transitions fit comfortably in HBM, and are densified on sampling — a gather
plus scatter, cheap next to the GNN matmuls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparseGraph(NamedTuple):
    features: jax.Array  # (N, 5) f32 — covariance traces exceed the f16 range
    # after long dead-reckoning stretches; f16 storage overflowed to inf and
    # NaN-ed the learner through the target network
    edge_idx: jax.Array  # (E, 2) int32 upper-triangle indices
    edge_w: jax.Array  # (E,) f16
    key_size: jax.Array  # () int32
    fro_size: jax.Array  # () int32


class Transition(NamedTuple):
    s: SparseGraph
    action_node: jax.Array  # () int32 — chosen node index
    reward: jax.Array  # () f32
    s1: SparseGraph
    done: jax.Array  # () bool


class ReplayState(NamedTuple):
    data: Transition  # stacked (capacity, ...)
    cursor: jax.Array  # () int32 next write slot
    size: jax.Array  # () int32 valid entries


def sparsify(adjacency: jax.Array, features: jax.Array, key_size, fro_size, e_cap: int) -> SparseGraph:
    """Top-``e_cap`` upper-triangle edges by weight.  Edges beyond capacity
    (pathological episodes only) are dropped lightest-first."""
    n = adjacency.shape[-1]
    iu = jnp.triu_indices(n, k=1)
    vals = adjacency[..., iu[0], iu[1]]
    top, pos = jax.lax.top_k(vals, e_cap)
    idx = jnp.stack([iu[0][pos], iu[1][pos]], axis=-1).astype(jnp.int32)
    return SparseGraph(
        features=features.astype(jnp.float32),
        edge_idx=idx,
        edge_w=top.astype(jnp.float16),
        key_size=jnp.asarray(key_size, jnp.int32),
        fro_size=jnp.asarray(fro_size, jnp.int32),
    )


def densify(g: SparseGraph, n: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (features (N,5) f32, adjacency (N,N) f32, node_valid (N,)).

    The edge list holds distinct upper-triangle positions (top_k picks
    distinct entries), so the scatters are marked unique — without the hint
    XLA must serialize them, and the batched replay densify dominated the
    learner update."""
    w = g.edge_w.astype(jnp.float32)
    adj = jnp.zeros((n, n))
    adj = adj.at[g.edge_idx[:, 0], g.edge_idx[:, 1]].max(w, unique_indices=True)
    adj = adj.at[g.edge_idx[:, 1], g.edge_idx[:, 0]].max(w, unique_indices=True)
    node_valid = jnp.arange(n) < (g.key_size + g.fro_size)
    return g.features.astype(jnp.float32), adj, node_valid


def densify_mm(g: SparseGraph, n: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """MXU-form :func:`densify`: build the dense adjacency as one-hot
    incidence matmuls instead of a scatter.

    Bitwise-equal to the scatter path: ``sparsify``'s top_k picks *distinct*
    upper-triangle positions, so every output cell receives exactly one
    nonzero contribution (plus exact-zero padding terms) — summation order
    cannot change the value.  The contraction is (N, E) @ (E, N) with
    E = edge capacity; at the training config that is ~2.3 GFLOP per graph of
    dense MXU work, replacing a serialized scatter-update loop that dominated
    the learner update's non-matmul time.

    Precision note (round 4b, measured): a bf16-split form — edge weights
    are f16, any f16 is exactly hi+lo for two bf16 terms, one-hots are exact
    in bf16 — reproduces this einsum bit for bit, but timed SLOWER on the
    axon v5e backend (711.9 vs 628.0 ms for the 64-update scan,
    ``data/ab/updates_ablate_r4b.txt``): the single fused scale+matmul
    beats two half-rate passes, i.e. the phase is not matmul-rate-bound.
    The f32 einsum stays."""
    w = g.edge_w.astype(jnp.float32)
    src = jax.nn.one_hot(g.edge_idx[:, 0], n, dtype=jnp.float32)  # (E, N)
    dst = jax.nn.one_hot(g.edge_idx[:, 1], n, dtype=jnp.float32)
    upper = jnp.einsum("en,e,em->nm", src, w, dst,
                       preferred_element_type=jnp.float32)
    adj = upper + upper.T
    node_valid = jnp.arange(n) < (g.key_size + g.fro_size)
    return g.features.astype(jnp.float32), adj, node_valid


def init_replay(capacity: int, n_nodes: int, e_cap: int) -> ReplayState:
    def zg():
        return SparseGraph(
            features=jnp.zeros((capacity, n_nodes, 5), jnp.float32),
            edge_idx=jnp.zeros((capacity, e_cap, 2), jnp.int32),
            edge_w=jnp.zeros((capacity, e_cap), jnp.float16),
            key_size=jnp.zeros((capacity,), jnp.int32),
            fro_size=jnp.zeros((capacity,), jnp.int32),
        )

    data = Transition(
        s=zg(),
        action_node=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,)),
        s1=zg(),
        done=jnp.zeros((capacity,), bool),
    )
    return ReplayState(data=data, cursor=jnp.int32(0), size=jnp.int32(0))


def push_batch(replay: ReplayState, batch: Transition, n_new: int) -> ReplayState:
    """Append ``n_new`` stacked transitions at the ring cursor."""
    capacity = replay.data.reward.shape[0]
    slots = (replay.cursor + jnp.arange(n_new)) % capacity

    def write(buf, new):
        return buf.at[slots].set(new)

    data = jax.tree.map(write, replay.data, batch)
    return ReplayState(
        data=data,
        cursor=(replay.cursor + n_new) % capacity,
        size=jnp.minimum(replay.size + n_new, capacity),
    )


def sample(replay: ReplayState, key: jax.Array, batch_size: int) -> Transition:
    """Uniform sample with replacement over valid entries (the reference uses
    ``random.sample`` without replacement; with 1e4 entries and batch 64 the
    difference is negligible)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(replay.size, 1))
    return jax.tree.map(lambda b: b[idx], replay.data)
