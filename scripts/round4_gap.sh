#!/usr/bin/env bash
# Round 4 eval window (run once the DQN schedule is done or near-done):
#   1. map-100 eval rerun at max_poses 2560 — round 3's 5x10 @2048 merge had
#      capacity-forced episodes in every chunk (runs/gap5.log: 2/2/2/2/1 of
#      10) — the guard demands zero forced lanes (VERDICT r3, missing #5).
#   2. g-U-Net DQN learning run to the reference band (VERDICT r3, next #4).
#   3. converged self-trained eval on the reference's own worlds (next #8).
# Chip choreography is the round-4 way: graceful stop (SIGTERM checkpoint-
# save) + flock chip lock — never kill-by-pid-and-hope.
# Usage: round4_gap.sh [steps...]  (default: all)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights
STEPS=${*:-"1 2 3"}

step() { echo "=== $(date +%H:%M:%S) $*" >&2; }

step "0. graceful trainer stop (checkpoint-save, no restart)"
python tools/stop_training.py --pid-file /tmp/sup_dqn.pid --grace 240 || true
python tools/durable_commit.py --run-dir runs/dqn_gcn_map40_r3 \
  --dest data/ckpt/dqn_gcn_map40 --once || true

case " $STEPS " in *" 1 "*)
step "1. map 100 @ 2560 (5 x 10 episodes)"
for off in 0 10 20 30 40; do
  step "1. map 100 chunk seed-offset $off"
  timeout 4800 python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 10 --seed-offset "$off" --method DQN --model GCN \
    --map-size 100 --max-poses 2560 --torch-weights $W/DQN_GCN/MyModel.pt \
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
git add data/eval && git commit -q \
  -m "eval: map 100 @ max_poses 2560, 5x10 episodes, zero capacity-forced lanes" \
  -- data/eval || true
;; esac

case " $STEPS " in *" 2 "*)
step "2. g-U-Net DQN to the reference band (~16k env-decisions @ P=256)"
timeout 7200 python -m drl_graph_exploration_tpu.train \
  --method DQN --model g-U-Net --map-size 40 --n-envs 64 --max-poses 256 \
  --decisions 250 --target-step-t 16000 --observe 2000 \
  --checkpoint-every 50 --slim-every 25 --seed 0 \
  --out-dir runs/dqn_gunet_map40_r4 || true
python tools/durable_commit.py --run-dir runs/dqn_gunet_map40_r4 \
  --dest data/ckpt/dqn_gunet_map40 --once || true
;; esac

case " $STEPS " in *" 3 "*)
step "3. converged self-trained eval on the reference's own test worlds"
timeout 4800 python -m drl_graph_exploration_tpu.evaluate --batched \
  --episodes 50 --method DQN --model GCN --map-size 40 --ref-worlds \
  --checkpoint runs/dqn_gcn_map40_r3/MyModel.msgpack \
  --out data/eval/40_DQN_GCN_selftrained_refworlds.csv || true
git add data/eval && git commit -q \
  -m "eval: self-trained DQN+GCN on the reference's test worlds (converged snapshot)" \
  -- data/eval || true
;; esac

echo "round4_gap done — relaunch training with scripts/round4_run.sh if the schedule isn't finished" >&2
