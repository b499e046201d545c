#!/usr/bin/env bash
# Gap v6: A2C+GCN at the reference's exact update shape — n_envs=1, one
# 40-sample window per Adam step — to validate ROUND3.md item 4's analysis
# (our A2C lags the reference curve because n_envs=64 gives 64x fewer
# sequential policy generations, not because of a semantics bug).  At
# n_envs=1 every generation is collected under the freshest policy, exactly
# like /root/reference/scripts/policy.py:310-399; if the analysis is right
# the curve should track the reference's A2C_GCN over the same window.
# Launch AFTER the DQN run crosses its >=500k-decision target; takes the
# chip until the wrap-up.  Usage: round3_gap6.sh [max_decisions] [timeout_s]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEC=${1:-64000}
TMO=${2:-4800}

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "0. stop the DQN supervisor + trainer (by PID)"
if [ -f /tmp/sup_dqn.pid ]; then
  SUP=$(cat /tmp/sup_dqn.pid)
  KIDS=$(ps -o pid= --ppid "$SUP" 2>/dev/null || true)
  kill "$SUP" 2>/dev/null || true
  sleep 2
  for k in $KIDS; do kill "$k" 2>/dev/null || true; done
  sleep 3
  for k in $SUP $KIDS; do kill -9 "$k" 2>/dev/null || true; done
  sleep 2
fi

step "1. final-ish durable snapshot of the DQN run"
python tools/durable_commit.py --run-dir runs/dqn_gcn_map40_r3 \
  --dest data/ckpt/dqn_gcn_map40 --once || true

step "2. A2C+GCN n_envs=1 (reference update shape), $DEC decisions, ${TMO}s cap"
timeout "$TMO" python -m drl_graph_exploration_tpu.train \
  --method A2C --model GCN --map-size 40 --n-envs 1 --decisions "$DEC" \
  --checkpoint-every 1000 --seed 0 --out-dir runs/a2c_gcn_map40_r3_b1 || true

step "3. durable snapshot of the n_envs=1 A2C run"
python tools/durable_commit.py --run-dir runs/a2c_gcn_map40_r3_b1 \
  --dest data/ckpt/a2c_gcn_map40_b1 --once || true

echo "gap6 done (wrap-up follows; DQN intentionally NOT resumed)" >&2
