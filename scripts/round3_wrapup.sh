#!/usr/bin/env bash
# Round-3 wrap-up (~1 h before round end): freeze training, make everything
# durable, refresh the flagship self-trained artifacts, and leave the chip
# idle for the driver's bench run.
#   1. stop the DQN supervisor + trainer (by PID, never by pattern)
#   2. final durable snapshot of the run into data/ckpt/
#   3. curve overlay + milestones regenerated from the final CSVs
#   4. self-trained policy eval on the reference's 50 bit-exact test worlds
#      (the 46k-decision table in EVAL.md gets its late-run refresh)
#   5. bench sanity run + a BENCH_B=256 A/B (default changes only if the
#      A/B wins; the driver's own run is the recorded number)
#   6. stop the durable-commit loop (by PID)
# Steps commit their own artifacts; failures fall through so a dead tunnel
# cannot take down the whole wrap-up.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "1. stop the DQN supervisor + trainer"
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

step "2. final durable snapshot"
python tools/durable_commit.py --run-dir runs/dqn_gcn_map40_r3 \
  --dest data/ckpt/dqn_gcn_map40 --once || true

step "3. curve overlay + milestones"
python scripts/compare_training_curve.py \
  runs/dqn_gcn_map40_r3/temp_reward.csv \
  data/ckpt/a2c_gcn_map40/temp_reward.csv \
  --label "DQN+GCN (ours, n_envs=64)" --label "A2C+GCN (ours, joint)" \
  --out data/eval/training_curve.png || true
python scripts/curve_milestones.py runs/dqn_gcn_map40_r3 \
  | tee data/eval/curve_milestones.txt || true
git add data/eval && git commit -q -m "final r3 training curve overlay + milestones" -- data/eval || true

step "4. self-trained eval on the reference's test worlds (final snapshot)"
timeout 2400 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 50 --method DQN --model GCN --map-size 40 --ref-worlds \
  --checkpoint data/ckpt/dqn_gcn_map40/MyModel.msgpack \
  --out data/eval/40_DQN_GCN_selftrained_refworlds.csv || true
git add data/eval && git commit -q \
  -m "self-trained DQN+GCN eval on the reference's 50 test worlds (final r3 snapshot)" \
  -- data/eval || true

step "5. bench sanity + BENCH_B / BENCH_STRIPE A/B"
timeout 1800 python bench.py | tee /tmp/bench_b128.json || true
timeout 1800 env BENCH_B=256 python bench.py | tee /tmp/bench_b256.json || true
timeout 1800 env BENCH_STRIPE=24 python bench.py | tee /tmp/bench_s24.json || true
echo "A/B: b128=$(cat /tmp/bench_b128.json 2>/dev/null)"
echo "     b256=$(cat /tmp/bench_b256.json 2>/dev/null)"
echo "     s24 =$(cat /tmp/bench_s24.json 2>/dev/null)"

step "6. stop durable-commit loop"
if [ -f /tmp/durable.pid ]; then kill "$(cat /tmp/durable.pid)" 2>/dev/null || true; fi

step "wrap-up done (review bench A/B + update ROUND3.md/EVAL.md by hand)"
