#!/usr/bin/env bash
# Gap v5: finish the two eval refreshes gap4 could not land.
#   1. map 60  @ max_poses 1024 — gap4's 640 run still pinned 16/50 lanes
#      at the cap (the current evaluator's episodes run genuinely longer
#      than round 2's); 1024 gives the longest lane ~2x headroom.
#   2. map 100 @ max_poses 2048 — gap4's 2x25-episode halves hit
#      RESOURCE_EXHAUSTED (25 lanes x (3*2048)^2 fp32 covariance = 3.8 GB
#      base + rollout forks; map-80 @ 50x1280 = 2.95 GB base was the
#      largest that fit).  5 chunks of 10 lanes (1.5 GB base) all share
#      one compiled shape, so chunks 2-5 start from the persistent cache.
#   3. resume the DQN supervisor.
# Precondition handled inline: stops the running supervisor + trainer by
# PID (never by pattern).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights

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

step "1. map 60 @ 1024"
timeout 4800 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 50 --method DQN --model GCN --map-size 60 --max-poses 1024 \
  --torch-weights $W/DQN_GCN/MyModel.pt --out data/eval/60_DQN_GCN.csv || true
git add data/eval && git commit -q -m "eval refresh (correct capacity): map 60 @ max_poses 1024" -- data/eval || true

step "2. map 100 @ 2048 (5 x 10 episodes)"
for off in 0 10 20 30 40; do
  step "2. map 100 chunk seed-offset $off"
  timeout 4800 python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 10 --seed-offset "$off" --method DQN --model GCN \
    --map-size 100 --max-poses 2048 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out "data/eval/100chunk$off.csv" || true
done
python - <<'EOF'
import csv, glob, os
parts = sorted(glob.glob("data/eval/100chunk*.csv"),
               key=lambda p: int(p.split("chunk")[1].split(".")[0]))
if len(parts) == 5:
    rows, hdr = [], None
    for f in parts:
        with open(f) as fh:
            r = csv.reader(fh)
            hdr = next(r)
            rows += list(r)
    with open("data/eval/100_DQN_GCN.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(hdr)
        w.writerows(rows)
    print(f"merged {len(rows)} rows from 5 chunks -> data/eval/100_DQN_GCN.csv")
    for f in parts:
        os.remove(f)
else:
    print(f"only {len(parts)}/5 chunks present; keeping previous 100_DQN_GCN.csv")
EOF
git add data/eval && git commit -q -m "eval refresh (correct capacity): map 100 @ max_poses 2048, 5x10 episodes merged" -- data/eval || true

step "3. resume DQN under the supervisor"
nohup python tools/train_supervisor.py --out-dir runs/dqn_gcn_map40_r3 \
  --stall-sec 300 --first-stall-sec 3600 --max-restarts 50 -- \
  --method DQN --model GCN --map-size 40 --n-envs 64 --decisions 15625 \
  --observe 5000 --checkpoint-every 100 --seed 0 \
  --resume runs/dqn_gcn_map40_r3/trainer_state.msgpack \
  >> runs/supervisor_dqn.log 2>&1 &
echo $! > /tmp/sup_dqn.pid
echo "gap5 done; DQN resumed (supervisor pid $(cat /tmp/sup_dqn.pid))" >&2
