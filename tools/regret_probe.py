"""Decompose the b1 trailing-avg curve gap into reward-alignment regret.

ROUND4.md §2 chain of evidence: the late-curve gap is real (3 seeds), not
optimizer lifetime, not entropy (the reference's converged actor is
SHARPER than ours — data/ab/logit_scale_probe.txt), and the b1 policy
evaluates at parity with the reference's shipped weights.  What remains is
*reward accounting*: each decision's logged reward is the chosen goal's
NORMALISED reward (0 or +1 only when the choice coincides with the
per-decision reward argmax; exploration_env.py:145-162), so trailing-avg
differences are exactly mean per-decision regret differences.

This probe runs the b1-shape loop (one env, softmax sampling with
act-time dropout, NO learning) under a given actor and logs:

* regret  = max valid normalised reward − chosen normalised reward
* hit     = chosen action is the reward argmax
* entropy = action-distribution entropy (one dropout draw, as sampled)

under (a) the reference's imported converged A2C_GCN actor and (b) our b1
seed-0 @64k actor.  If (a)'s mean regret ≈ its curve level and (b)'s ≈
ours, the gap is fully accounted by argmax-alignment of converged
policies in this env — a policy-style difference, not a training defect.

Usage:
    python tools/regret_probe.py --decisions 3000 \
        --actor ref|b1 [--out data/ab/regret_ref.txt]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--actor", choices=["ref", "b1", "both"], default="both")
    ap.add_argument("--decisions", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    base = ExplorationConfig().with_map_size(40.0).tightened()
    config = dataclasses.replace(
        base, capacity=dataclasses.replace(base.capacity, max_poses=256)
    )
    n = config.capacity.max_nodes
    actor, _ = gnn.build_a2c_models("GCN", n)

    from flax import serialization

    dummy_f = jnp.zeros((n, 5))
    dummy_a = jnp.zeros((n, n))
    dummy_v = jnp.ones((n,), bool)
    fresh = actor.init(
        jax.random.PRNGKey(0), dummy_f, dummy_a, dummy_v, dummy_v
    )
    variants = {}
    if args.actor in ("ref", "both"):
        variants["ref"] = it.gcn_params_from_torch(it.load_state_dict(REF_W))
    if args.actor in ("b1", "both"):
        with open(B1_CKPT, "rb") as f:
            variants["b1"] = serialization.from_bytes(fresh, f.read())

    @jax.jit
    def decide(params, state, key):
        """One b1-shape decision: observe -> sample actor -> reward stats ->
        macro -> flag done.  Mirrors a2c.decision_step_impl minus learning."""
        k_drop, k_choice, k_next = jax.random.split(key, 3)
        obs, frontiers = ee.observe(state, config)
        acts = ee.actions_all_goals(state, frontiers, config)
        norm, _raw, state = ee.rewards_all_goals(state, frontiers, acts, config)
        mask = dqn_mod.frontier_slot_mask(obs.key_size, obs.fro_size, n)
        probs = actor.apply(
            params, obs.features, obs.adjacency, obs.node_valid, mask,
            dropout_key=k_drop,
        )
        ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs + 1e-35), 0.0))
        action_node = jax.random.categorical(
            k_choice, jnp.log(probs + 1e-35)
        ).astype(jnp.int32)
        gi = jnp.clip(action_node - obs.key_size, 0, norm.shape[-1] - 1)
        gv = jnp.arange(norm.shape[-1]) < frontiers.count
        r_t = norm[gi]
        best = jnp.max(jnp.where(gv, norm, -jnp.inf))
        chosen = jax.tree.map(lambda x: x[gi], acts)
        state = dqn_mod.run_macro(state, chosen.odoms, chosen.valid, config)
        done = ee.is_done(state, config) | (frontiers.count == 0)
        return state, k_next, r_t, best - r_t, (best - r_t) <= 1e-6, ent, done

    all_lines = []
    for name, params in variants.items():
      key = jax.random.PRNGKey(args.seed)
      k_env, key = jax.random.split(key)
      state = ee.reset(k_env, config)
      rs, regrets, hits, ents, episodes = [], [], [], [], 0
      for d in range(args.decisions):
        state, key, r_t, regret, hit, ent, done = decide(params, state, key)
        rs.append(float(r_t))
        regrets.append(float(regret))
        hits.append(bool(hit))
        ents.append(float(ent))
        if bool(done):
            episodes += 1
            k_env, key = jax.random.split(key)
            state = ee.reset(k_env, config)
        if d % 200 == 0:
            print(
                f"[{name}] decision {d}: mean_r {np.mean(rs):+.3f} regret "
                f"{np.mean(regrets):.3f} hit {np.mean(hits):.2%}",
                flush=True,
            )

      all_lines += [
        f"actor={name} decisions={args.decisions} episodes={episodes}",
        f"  mean reward          {np.mean(rs):+.4f}",
        f"  mean regret          {np.mean(regrets):.4f}",
        f"  argmax hit rate      {np.mean(hits):.2%}",
        f"  mean sampled entropy {np.mean(ents):.3f} nats",
      ]
    out = "\n".join(all_lines)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
