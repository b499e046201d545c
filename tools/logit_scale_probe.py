"""Round-5 agenda item (ROUND4.md §2): does the reference's shipped A2C
actor produce a systematically SOFTER softmax than our b1-trained actors on
identical graphs?

The b1 curve gap correlates with action-entropy collapse (0.40 -> 0.09 nats
over the gap window; the un-detached entropy bonus at 0.01 does not stop
it).  The reference cannot be run here (no torch_geometric), but its
shipped A2C_GCN weights CAN be imported bit-exactly — so compare, on the
same observation graphs from our env:

* imported reference A2C_GCN actor  (their converged exploration schedule)
* our b1 seed-0 actor @64k          (data/ckpt/a2c_gcn_map40_b1)
* a fresh flax init                 (the starting point)

reporting softmax entropy (deterministic forward and one dropout draw) and
frontier-logit spread.  If the reference's converged policy is much softer,
the late-curve gap is an exploration-schedule artefact, not a capability
bug — actionable via an ent_coef/temperature knob documented as a
deviation.

Usage: JAX_PLATFORMS=cpu python tools/logit_scale_probe.py [--decisions 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.config import ExplorationConfig
from drl_graph_exploration_tpu.env import exploration_env as ee
from drl_graph_exploration_tpu.models import gnn
from drl_graph_exploration_tpu.models import import_torch as it
from drl_graph_exploration_tpu.rl import dqn as dqn_mod

REF_W = "/root/reference/data/torch_weights/A2C_GCN/MyModel.pt"
B1_CKPT = "data/ckpt/a2c_gcn_map40_b1/MyModel.msgpack"


def collect_observations(config, n_seeds, decisions_per_seed):
    """Greedy-reward play (no policy in the loop) to produce a spread of
    realistic mid-episode graphs."""
    obs_list = []
    for seed in range(n_seeds):
        s = ee.reset(jax.random.PRNGKey(1000 + seed), config)
        for d in range(decisions_per_seed):
            obs, frontiers = ee.observe(s, config)
            acts = ee.actions_all_goals(s, frontiers, config)
            norm, _raw, s = ee.rewards_all_goals(s, frontiers, acts, config)
            gi = int(jnp.nanargmax(jnp.where(jnp.isfinite(norm), norm, -jnp.inf)))
            chosen = jax.tree.map(lambda x: x[gi], acts)
            s = dqn_mod.run_macro(s, chosen.odoms, chosen.valid, config)
            if bool(ee.is_done(s, config)):
                break
            obs_list.append(obs)
    return obs_list


def entropy_stats(actor, params, obs_list, key):
    det_e, drop_e, spreads = [], [], []
    n = obs_list[0].features.shape[0]
    fwd = jax.jit(
        lambda p, f, a, v, m, k: actor.apply(p, f, a, v, m, dropout_key=k)
    )
    for i, obs in enumerate(obs_list):
        mask = dqn_mod.frontier_slot_mask(obs.key_size, obs.fro_size, n)
        for name, k in (("det", None), ("drop", jax.random.fold_in(key, i))):
            probs = fwd(params, obs.features, obs.adjacency, obs.node_valid,
                        mask, k)
            p = np.asarray(probs)
            ent = -np.sum(np.where(p > 0, p * np.log(p + 1e-35), 0.0))
            (det_e if name == "det" else drop_e).append(ent)
        p = np.asarray(p)
        on = p[np.asarray(mask)]
        if on.size > 1:
            logits = np.log(on + 1e-35)
            spreads.append(np.ptp(logits))
    return det_e, drop_e, spreads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--decisions", type=int, default=20)
    args = ap.parse_args()

    base = ExplorationConfig().with_map_size(40.0).tightened()
    config = dataclasses.replace(
        base, capacity=dataclasses.replace(base.capacity, max_poses=256)
    )
    n = config.capacity.max_nodes
    actor, _critic = gnn.build_a2c_models("GCN", n)

    print("collecting observation graphs ...", flush=True)
    obs_list = collect_observations(config, args.seeds, args.decisions)
    print(f"{len(obs_list)} observations", flush=True)

    dummy_f = jnp.zeros((n, 5))
    dummy_a = jnp.zeros((n, n))
    dummy_v = jnp.ones((n,), bool)
    fresh = actor.init(jax.random.PRNGKey(0), dummy_f, dummy_a, dummy_v, dummy_v)

    variants = {"fresh-init": fresh}
    sd = it.load_state_dict(REF_W)
    variants["reference A2C_GCN (imported)"] = it.gcn_params_from_torch(sd)
    if os.path.exists(B1_CKPT):
        from flax import serialization

        with open(B1_CKPT, "rb") as f:
            variants["ours b1 seed-0 @64k"] = serialization.from_bytes(
                fresh, f.read()
            )

    key = jax.random.PRNGKey(7)
    for name, params in variants.items():
        det_e, drop_e, spreads = entropy_stats(actor, params, obs_list, key)
        print(
            f"{name:32s} entropy det mean {np.mean(det_e):.3f} "
            f"(p50 {np.median(det_e):.3f})  one-dropout-draw mean "
            f"{np.mean(drop_e):.3f}  frontier-logit ptp p50 "
            f"{np.median(spreads):.2f}"
        )


if __name__ == "__main__":
    main()
