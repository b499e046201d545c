#!/usr/bin/env bash
# Round-3 chip-gap plan: run the short chip jobs that must serialize with the
# long DQN training run, committing each result durably, then hand the chip
# back to DQN.  Ordered by marginal value in case the round ends mid-gap:
#
#   1. A2C+GCN from-scratch curve (the one direct curve-vs-curve comparison
#      the reference's shipped logs allow — VERDICT r2 item 4)
#   2. self-trained DQN eval on the reference's own 50 test worlds
#   3. g-U-Net DQN smoke (20k env-decisions: the third family learns)
#   4. bf16 A/B of the updates phase + CI-fold Pallas vs XLA A/B
#   5. relaunch the DQN supervisor with --resume from the full checkpoint
#
# Precondition: the DQN supervisor + trainer are STOPPED (kill the PIDs in
# /tmp/sup_dqn.pid and the trainer it spawned; do NOT pkill by pattern).
# Each step is best-effort: a failure skips to the next so the chip always
# returns to DQN.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p data/ab

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "1. A2C+GCN from scratch (64k env-decisions)"
timeout 7200 python -m drl_graph_exploration_tpu.train \
  --method A2C --model GCN --map-size 40 --n-envs 64 --decisions 1000 \
  --checkpoint-every 100 --seed 0 --out-dir runs/a2c_gcn_map40_r3 || true
python tools/durable_commit.py --run-dir runs/a2c_gcn_map40_r3 \
  --dest data/ckpt/a2c_gcn_map40 --once || true

step "2. self-trained DQN eval (reference's 50 test worlds)"
if [ -f data/ckpt/dqn_gcn_map40/MyModel.msgpack ]; then
  timeout 3000 python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method DQN --model GCN --map-size 40 \
    --checkpoint data/ckpt/dqn_gcn_map40/MyModel.msgpack --ref-worlds \
    --out data/eval/40_DQN_GCN_selftrained_refworlds.csv || true
  git add data/eval && git commit -q -m "eval: self-trained DQN+GCN on the reference's 50 test worlds" -- data/eval || true
fi

step "3. g-U-Net DQN smoke (20k env-decisions)"
timeout 5400 python -m drl_graph_exploration_tpu.train \
  --method DQN --model g-U-Net --map-size 40 --n-envs 64 --decisions 320 \
  --observe 5000 --checkpoint-every 80 --seed 0 \
  --out-dir runs/dqn_gunet_map40_r3 || true
python tools/durable_commit.py --run-dir runs/dqn_gunet_map40_r3 \
  --dest data/ckpt/dqn_gunet_map40 --once || true

step "4. updates-phase bf16 A/B + CI-fold A/B"
timeout 2400 python tools/profile_update_parts.py 512 64 64      > data/ab/updates_f32.txt 2>&1 || true
timeout 2400 python tools/profile_update_parts.py 512 64 64 bf16 > data/ab/updates_bf16.txt 2>&1 || true
timeout 2400 python tools/test_pallas_ci.py > data/ab/ci_fold.txt 2>&1 || true
git add data/ab && git commit -q -m "A/B results: updates-phase bf16, CI-fold Pallas (TPU)" -- data/ab || true

step "5. resume DQN under the supervisor"
nohup python tools/train_supervisor.py --out-dir runs/dqn_gcn_map40_r3 \
  --stall-sec 300 --first-stall-sec 3600 --max-restarts 50 -- \
  --method DQN --model GCN --map-size 40 --n-envs 64 --decisions 15625 \
  --observe 5000 --checkpoint-every 100 --seed 0 \
  --resume runs/dqn_gcn_map40_r3/trainer_state.msgpack \
  >> runs/supervisor_dqn.log 2>&1 &
echo $! > /tmp/sup_dqn.pid
echo "gap done; DQN resumed (supervisor pid $(cat /tmp/sup_dqn.pid))" >&2
