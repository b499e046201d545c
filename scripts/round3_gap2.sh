#!/usr/bin/env bash
# Gap v2: remaining chip jobs after the self-trained eval, with the A2C OOM
# fixed via gradient accumulation (--grad-chunk 4; see rl/a2c.py
# a2c_loss_and_grads and tests/test_a2c_grad_chunk.py).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p data/ab

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "commit self-trained eval if present"
git add data/eval && git commit -q -m "eval: self-trained DQN+GCN (46k decisions) on the reference's 50 test worlds" -- data/eval || true

step "1. A2C+GCN from scratch (64k env-decisions, grad-chunk 4)"
timeout 7200 python -m drl_graph_exploration_tpu.train \
  --method A2C --model GCN --map-size 40 --n-envs 64 --decisions 1000 \
  --grad-chunk 4 --checkpoint-every 100 --seed 0 \
  --out-dir runs/a2c_gcn_map40_r3 || true
python tools/durable_commit.py --run-dir runs/a2c_gcn_map40_r3 \
  --dest data/ckpt/a2c_gcn_map40 --once || true

step "2. g-U-Net DQN smoke (20k env-decisions)"
timeout 5400 python -m drl_graph_exploration_tpu.train \
  --method DQN --model g-U-Net --map-size 40 --n-envs 64 --decisions 320 \
  --observe 5000 --checkpoint-every 80 --seed 0 \
  --out-dir runs/dqn_gunet_map40_r3 || true
python tools/durable_commit.py --run-dir runs/dqn_gunet_map40_r3 \
  --dest data/ckpt/dqn_gunet_map40 --once || true

step "3. updates-phase bf16 A/B + CI-fold A/B"
timeout 2400 python tools/profile_update_parts.py 512 64 64      > data/ab/updates_f32.txt 2>&1 || true
timeout 2400 python tools/profile_update_parts.py 512 64 64 bf16 > data/ab/updates_bf16.txt 2>&1 || true
timeout 2400 python tools/test_pallas_ci.py > data/ab/ci_fold.txt 2>&1 || true
git add data/ab && git commit -q -m "A/B results: updates-phase bf16, CI-fold Pallas (TPU)" -- data/ab || true

step "4. resume DQN under the supervisor"
nohup python tools/train_supervisor.py --out-dir runs/dqn_gcn_map40_r3 \
  --stall-sec 300 --first-stall-sec 3600 --max-restarts 50 -- \
  --method DQN --model GCN --map-size 40 --n-envs 64 --decisions 15625 \
  --observe 5000 --checkpoint-every 100 --seed 0 \
  --resume runs/dqn_gcn_map40_r3/trainer_state.msgpack \
  >> runs/supervisor_dqn.log 2>&1 &
echo $! > /tmp/sup_dqn.pid
echo "gap2 done; DQN resumed (supervisor pid $(cat /tmp/sup_dqn.pid))" >&2
