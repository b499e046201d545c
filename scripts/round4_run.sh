#!/usr/bin/env bash
# Round 4 main run: resume the DQN+GCN map-40 schedule and drive it to the
# full 1e6 env-decisions (VERDICT r3, next #1) with the round-4 trainer:
#  - SIGTERM checkpoint-save + chip lock (no more kill-and-hope preemption),
#  - slim checkpoints every 25 decisions / full every 250,
#  - hoisted grouped Q-targets + matmul densify + hardware-RNG dropout +
#    K-slot resets (equivalence-tested; docs/PROFILE_r4.md has the A/B),
#  - --target-step-t 1000000 so the schedule total survives restarts.
# Usage: round4_run.sh [out_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-runs/dqn_gcn_map40_r3}

# stop any previous supervisor gracefully (checkpoint-save, no restart)
python tools/stop_training.py --pid-file /tmp/sup_dqn.pid --grace 180 || true

# fresh VM (runs/ is not committed): seed the run dir from the durable
# git snapshot so --resume-slim continues the schedule and the CSV curves
# extend instead of restarting from zero
if [ ! -d "$OUT" ] && [ -f data/ckpt/dqn_gcn_map40/slim_state.msgpack ]; then
  mkdir -p "$OUT"
  cp data/ckpt/dqn_gcn_map40/slim_state.msgpack \
     data/ckpt/dqn_gcn_map40/MyModel.msgpack \
     data/ckpt/dqn_gcn_map40/reward_data.csv \
     data/ckpt/dqn_gcn_map40/temp_reward.csv \
     data/ckpt/dqn_gcn_map40/temp_loss.csv "$OUT/" 2>/dev/null || true
  echo "seeded $OUT from data/ckpt/dqn_gcn_map40 (durable snapshot)"
fi

RESUME=""
if [ -f "$OUT/trainer_state.msgpack" ]; then
  RESUME="--resume $OUT/trainer_state.msgpack"
elif [ -f "$OUT/slim_state.msgpack" ]; then
  # learner-only resume: replay/envs re-warm, schedules continue from the
  # saved step_t; supervisor restarts add --resume once a full checkpoint
  # lands (the run-dir slim file is always >= the full file, so applying
  # both keeps the newest learner with the newest available replay)
  RESUME="--resume-slim $OUT/slim_state.msgpack"
fi

nohup python tools/train_supervisor.py \
  --out-dir "$OUT" --stall-sec 300 --first-stall-sec 3600 \
  --max-restarts 100 --grace-sec 180 -- \
  --method DQN --model GCN --map-size 40 --n-envs 64 \
  --decisions 1000000 --target-step-t 1000000 --observe 5000 \
  --checkpoint-every 750 --slim-every 25 --seed 0 \
  --fast-dropout $RESUME \
  > runs/supervisor_dqn.log 2>&1 &
echo $! > /tmp/sup_dqn.pid
echo "supervisor pid $(cat /tmp/sup_dqn.pid) -> $OUT"

# durable git snapshots of the learner (slim) + curves every 25 min
if ! [ -f /tmp/durable.pid ] || ! kill -0 "$(cat /tmp/durable.pid)" 2>/dev/null; then
  nohup python tools/durable_commit.py --run-dir "$OUT" \
    --dest data/ckpt/dqn_gcn_map40 --interval 1500 \
    >> runs/durable_dqn.log 2>&1 &
  echo $! > /tmp/durable.pid
  echo "durable pid $(cat /tmp/durable.pid)"
fi
