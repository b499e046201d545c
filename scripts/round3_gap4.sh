#!/usr/bin/env bash
# Gap v4: redo the large-map eval refreshes with the pose capacities the
# episodes actually need.  gap3's refresh ran evaluate.py at the default
# --max-poses 512, so the capacity-forced done truncated every episode at
# ~507 steps (map-80/100 genuinely run to ~1013/~1464 — see EVAL.md's
# capacity note); the 60/80/100 CSVs it committed are invalid.
#   1. map 60  @ max_poses 640   (longest genuine episode ~518 steps)
#   2. map 80  @ max_poses 1280
#   3. map 100 @ max_poses 2048, two 25-episode halves (HBM), merged
#   4. resume the DQN supervisor
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "1. map 60 @ 640"
timeout 4200 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 50 --method DQN --model GCN --map-size 60 --max-poses 640 \
  --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/60_DQN_GCN.csv || true
git add data/eval && git commit -q -m "eval refresh (correct capacity): map 60 @ max_poses 640" -- data/eval || true

step "2. map 80 @ 1280"
timeout 5400 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 50 --method DQN --model GCN --map-size 80 --max-poses 1280 \
  --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/80_DQN_GCN.csv || true
git add data/eval && git commit -q -m "eval refresh (correct capacity): map 80 @ max_poses 1280" -- data/eval || true

step "3. map 100 @ 2048 (2 x 25 episodes)"
timeout 5400 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 25 --seed-offset 0 --method DQN --model GCN --map-size 100 \
  --max-poses 2048 --torch-weights $W/DQN_GCN/MyModel.pt \
  --out data/eval/100a.csv || true
timeout 5400 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 25 --seed-offset 25 --method DQN --model GCN --map-size 100 \
  --max-poses 2048 --torch-weights $W/DQN_GCN/MyModel.pt \
  --out data/eval/100b.csv || true
python - <<'EOF' && rm -f data/eval/100a.csv data/eval/100b.csv
import csv, os
a, b = "data/eval/100a.csv", "data/eval/100b.csv"
if os.path.exists(a) and os.path.exists(b):
    rows = []
    for f in (a, b):
        with open(f) as fh:
            r = csv.reader(fh)
            hdr = next(r)
            rows += list(r)
    with open("data/eval/100_DQN_GCN.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(hdr)
        w.writerows(rows)
    print(f"merged {len(rows)} rows -> data/eval/100_DQN_GCN.csv")
else:
    print("one half missing; keeping previous 100_DQN_GCN.csv")
EOF
git add data/eval && git commit -q -m "eval refresh (correct capacity): map 100 @ max_poses 2048, 2x25 episodes merged" -- data/eval || true

step "4. resume DQN under the supervisor"
nohup python tools/train_supervisor.py --out-dir runs/dqn_gcn_map40_r3 \
  --stall-sec 300 --first-stall-sec 3600 --max-restarts 50 -- \
  --method DQN --model GCN --map-size 40 --n-envs 64 --decisions 15625 \
  --observe 5000 --checkpoint-every 100 --seed 0 \
  --resume runs/dqn_gcn_map40_r3/trainer_state.msgpack \
  >> runs/supervisor_dqn.log 2>&1 &
echo $! > /tmp/sup_dqn.pid
echo "gap4 done; DQN resumed (supervisor pid $(cat /tmp/sup_dqn.pid))" >&2
