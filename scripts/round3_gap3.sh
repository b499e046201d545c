#!/usr/bin/env bash
# Gap v3 (after the tunnel recovered from the g-U-Net kernel fault):
#   1. A2C+GCN rerun with --per-env-updates (reference update density; the
#      joint-update run plateaued at -0.14 vs the reference's ~0.0)
#   2. g-U-Net DQN smoke retry at max_poses=256 (P=512 crashed the TPU
#      worker with a kernel fault)
#   3. updates-phase bf16 + CI-fold A/B reruns (first attempt hit the dead
#      tunnel; committed files hold tracebacks, overwrite them)
#   4. refresh the published eval CSVs on the current evaluator (VERDICT r2
#      item 3) — map 40 first, large maps last (heaviest compiles)
#   5. resume the DQN supervisor
# Each step commits its artifacts; failures fall through.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p data/ab
W=/root/reference/data/torch_weights

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "1. A2C+GCN per-env updates (64k env-decisions)"
timeout 7200 python -m drl_graph_exploration_tpu.train \
  --method A2C --model GCN --map-size 40 --n-envs 64 --decisions 1000 \
  --per-env-updates --checkpoint-every 100 --seed 0 \
  --out-dir runs/a2c_gcn_map40_r3pe || true
python tools/durable_commit.py --run-dir runs/a2c_gcn_map40_r3pe \
  --dest data/ckpt/a2c_gcn_map40_perenv --once || true

step "2. g-U-Net DQN smoke retry (P=256)"
timeout 5400 python -m drl_graph_exploration_tpu.train \
  --method DQN --model g-U-Net --map-size 40 --n-envs 64 --decisions 320 \
  --max-poses 256 --observe 5000 --checkpoint-every 80 --seed 0 \
  --out-dir runs/dqn_gunet_map40_r3 || true
python tools/durable_commit.py --run-dir runs/dqn_gunet_map40_r3 \
  --dest data/ckpt/dqn_gunet_map40 --once || true

step "3. A/B reruns"
timeout 2400 python tools/profile_update_parts.py 512 64 64      > data/ab/updates_f32.txt 2>&1 || true
timeout 2400 python tools/profile_update_parts.py 512 64 64 bf16 > data/ab/updates_bf16.txt 2>&1 || true
timeout 2400 python tools/test_pallas_ci.py > data/ab/ci_fold.txt 2>&1 || true
git add data/ab && git commit -q -m "A/B results: updates-phase bf16, CI-fold Pallas (TPU, post-recovery rerun)" -- data/ab || true

step "4. eval refresh (current evaluator)"
refresh() {
  timeout 3000 python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 "$@" || true
  git add data/eval && git commit -q -m "eval refresh (current evaluator): $*" -- data/eval || true
}
refresh --method DQN --model GCN --map-size 40 --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/40_DQN_GCN.csv
refresh --method A2C --model GCN --map-size 40 --torch-weights $W/A2C_GCN/MyModel.pt --out data/eval/40_A2C_GCN.csv
refresh --method DQN --model GCN --map-size 40 --torch-weights $W/DQN_GCN/MyModel.pt --ref-worlds --out data/eval/40_DQN_GCN_refworlds.csv
refresh --method DQN --model GCN --map-size 60 --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/60_DQN_GCN.csv
refresh --method DQN --model GCN --map-size 80 --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/80_DQN_GCN.csv
refresh --method DQN --model GCN --map-size 100 --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/100_DQN_GCN.csv

step "5. resume DQN under the supervisor"
nohup python tools/train_supervisor.py --out-dir runs/dqn_gcn_map40_r3 \
  --stall-sec 300 --first-stall-sec 3600 --max-restarts 50 -- \
  --method DQN --model GCN --map-size 40 --n-envs 64 --decisions 15625 \
  --observe 5000 --checkpoint-every 100 --seed 0 \
  --resume runs/dqn_gcn_map40_r3/trainer_state.msgpack \
  >> runs/supervisor_dqn.log 2>&1 &
echo $! > /tmp/sup_dqn.pid
echo "gap3 done; DQN resumed (supervisor pid $(cat /tmp/sup_dqn.pid))" >&2
