#!/usr/bin/env bash
# DQN+GG-NN learning run to the reference band (round 4, session 2).
#
# Completes "all three model families have learning evidence" (VERDICT r3
# next #4 names the families; GG-NN had no training run at all): same shape
# as the g-U-Net band run — n_envs=64, P=256, 1e6-style schedules, durable
# snapshots to data/ckpt/dqn_ggnn_map40.  GG-NN target_update is 9000
# (train.py picks it from the model name, reference policy.py:37-38).
#
# Run manually inside a /tmp/queue_pause window or after the queue drains:
#   BUDGET=2400 bash scripts/round4_ggnn.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

BUDGET=${BUDGET:-2400}
R=runs/dqn_ggnn_map40_r4
D=data/ckpt/dqn_ggnn_map40
mkdir -p "$R"
RES=""
[ -f "$R/slim_state.msgpack" ] && RES="--resume-slim $R/slim_state.msgpack"
timeout --signal=TERM --kill-after=120 "$BUDGET" \
  python -m drl_graph_exploration_tpu.train \
  --method DQN --model GG-NN --map-size 40 --n-envs 64 --max-poses 256 \
  --decisions 1000 --target-step-t 26000 --observe 2000 \
  --checkpoint-every 100 --slim-every 25 --seed 0 \
  $RES --out-dir "$R" || true
python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
git add "$D" && git commit -q \
  -m "training snapshot: dqn_ggnn_map40 (GG-NN family learning evidence)" \
  -- "$D" || true
tail -3 "$D/temp_reward.csv" 2>/dev/null
