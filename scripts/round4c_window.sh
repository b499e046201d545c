#!/usr/bin/env bash
# Round-4 session-3 chip queue (fresh machine — runs/ was wiped, durable
# state lives in data/ckpt).  Finishes what sessions 1-2 left:
#   1. GG-NN band run to 26k            (third model family evidence)
#   2. map-100 @2560 chunk30 + merge    (the one missing hygiene chunk)
#   3. map-80 @1792 rerun               (8/50 forced at 1280 in round 3)
#   4. g-U-Net resume 11.5k -> 64k cap  (reference band crossing)
#   5. A2C b1 seeds 1,2 -> 32k          (3-seed band probe)
# Chip discipline: flock chip lock inside every python chip user; between
# steps honour /tmp/chip_yield (driver bench) and /tmp/queue_pause (manual
# A/B window).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights

DEADLINE=${DEADLINE:-$(date -d '2026-08-21 18:40 UTC' +%s)}

step() { echo "=== $(date +%H:%M:%S) $*"; }
left() { [ -f /tmp/chip_yield ] && { echo 0; return; }; echo $(( DEADLINE - $(date +%s) )); }
min() { echo $(( $1 < $2 ? $1 : $2 )); }
gate() {
  while [ -f /tmp/queue_pause ]; do
    step "(paused for manual chip work — rm /tmp/queue_pause to resume)"
    sleep 30
  done
  [ "$(left)" -gt "$1" ]
}
# seed a fresh run dir from its durable snapshot so --resume-slim works and
# the CSV curves extend across the machine wipe
reseed() { # reseed <run-dir> <durable-dir>
  mkdir -p "$1"
  for f in slim_state.msgpack temp_reward.csv reward_data.csv temp_loss.csv; do
    [ -f "$1/$f" ] || { [ -f "$2/$f" ] && cp "$2/$f" "$1/$f"; }
  done
}

# ---- 1. GG-NN band run (third family) ---------------------------------
if gate 1800; then
  R=runs/dqn_ggnn_map40_r4; D=data/ckpt/dqn_ggnn_map40
  mkdir -p "$R" "$D"
  reseed "$R" "$D"
  RES=""
  [ -f "$R/slim_state.msgpack" ] && RES="--resume-slim $R/slim_state.msgpack"
  step "1. GG-NN DQN band run (target 26000)"
  python tools/durable_commit.py --run-dir "$R" --dest "$D" \
    --interval 1200 > runs/durable_ggnn.log 2>&1 &
  DUR=$!
  timeout --signal=TERM --kill-after=120 "$(min 7200 $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method DQN --model GG-NN --map-size 40 --n-envs 64 --max-poses 256 \
    --decisions 1000 --target-step-t 26000 --observe 2000 \
    --checkpoint-every 100 --slim-every 25 --seed 0 \
    $RES --out-dir "$R" > runs/ggnn_train.log 2>&1 || true
  kill "$DUR" 2>/dev/null
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: dqn_ggnn_map40 (GG-NN family learning evidence)" \
    -- "$D" || true
  tail -2 "$D/temp_reward.csv" || true
fi

# ---- 2. map-100 @2560 chunk seed-offset 30 + merge --------------------
if gate 1500 && [ ! -f data/eval/100chunk30.csv ]; then
  step "2. map 100 @ 2560 chunk seed-offset 30"
  timeout "$(min 3600 $(( $(left) + 600 )))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 10 --seed-offset 30 --method DQN --model GCN \
    --map-size 100 --max-poses 2560 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out data/eval/100chunk30.csv > runs/eval100c30.log 2>&1 || true
  git add data/eval && git commit -q \
    -m "eval: map 100 @ max_poses 2560 chunk (seed offset 30)" -- data/eval || true
fi
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
  -m "eval: map 100 @ max_poses 2560 merged (capacity-forced-lane hygiene)" \
  -- data/eval || true

# ---- 3. map-80 @1792 rerun --------------------------------------------
if gate 2400; then
  step "3. map 80 @ 1792 rerun (8/50 were capacity-forced at 1280)"
  timeout "$(min 4800 $(( $(left) + 600 )))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method DQN --model GCN \
    --map-size 80 --max-poses 1792 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out data/eval/80_DQN_GCN.csv > runs/eval80.log 2>&1 || true
  git add data/eval && git commit -q \
    -m "eval: map 80 @ max_poses 1792 rerun (capacity-forced-lane hygiene)" \
    -- data/eval || true
fi

# ---- 4. g-U-Net resume -> 64k cap -------------------------------------
if gate 1800; then
  G=runs/dqn_gunet_map40_r4; D=data/ckpt/dqn_gunet_map40
  reseed "$G" "$D"
  step "4. g-U-Net band run (resume step_t $(tail -1 $G/temp_reward.csv | cut -d, -f1), target 64000)"
  python tools/durable_commit.py --run-dir "$G" --dest "$D" \
    --interval 1500 > runs/durable_gunet.log 2>&1 &
  DUR=$!
  # reserve ~2.5h for the b1 seed probes; the rest is g-U-Net's
  timeout --signal=TERM --kill-after=120 "$(min 14400 $(( $(left) - 9000 > 1800 ? $(left) - 9000 : 1800 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method DQN --model g-U-Net --map-size 40 --n-envs 64 --max-poses 256 \
    --decisions 1000 --target-step-t 64000 --observe 2000 \
    --checkpoint-every 100 --slim-every 25 --seed 0 \
    --resume-slim "$G/slim_state.msgpack" \
    --out-dir "$G" > runs/gunet_train.log 2>&1 || true
  kill "$DUR" 2>/dev/null
  python tools/durable_commit.py --run-dir "$G" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: dqn_gunet_map40 (round-4 band run)" -- "$D" || true
  tail -2 "$D/temp_reward.csv" || true
fi

# ---- 5. A2C b1 seeds 1 & 2 (3-seed band probe) ------------------------
for SEED in 1 2; do
  gate 1800 || { step "deadline — skipping b1 seed $SEED"; break; }
  R=runs/a2c_gcn_map40_r4_b1s$SEED
  D=data/ckpt/a2c_gcn_map40_b1s$SEED
  mkdir -p "$R" "$D"
  reseed "$R" "$D"
  step "5. A2C b1 seed $SEED on chip (target 32000 decisions)"
  RES=""
  [ -f "$R/slim_state.msgpack" ] && RES="--resume-slim $R/slim_state.msgpack"
  python tools/durable_commit.py --run-dir "$R" --dest "$D" \
    --interval 1500 > "runs/durable_b1s$SEED.log" 2>&1 &
  DUR=$!
  timeout --signal=TERM --kill-after=120 "$(min 9000 $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method A2C --model GCN --map-size 40 --n-envs 1 \
    --decisions 32000 --target-step-t 32000 \
    --checkpoint-every 1000 --slim-every 200 --seed "$SEED" \
    $RES --out-dir "$R" > "runs/b1s${SEED}_train.log" 2>&1 || true
  kill "$DUR" 2>/dev/null
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: a2c_gcn_map40_b1 seed $SEED (3-seed band probe)" \
    -- "$D" || true
done

step "session-3 window done; chip free"
touch /tmp/round4c_window_done
