#!/usr/bin/env bash
# Round-4 EXTENDED eval-window queue (session 2 of the round).
#
# The first window (scripts/round4_window.sh) ran against a ~09:10 UTC
# deadline guess; the round actually continues to ~18:00 UTC, so this
# queue finishes what that one had to cut:
#   1. map-100 @2560 hygiene chunks 10..40 + merge   (VERDICT r3 next #6)
#   2. map-80  @1792 hygiene rerun                   (next #6)
#   3. g-U-Net DQN to the reference band (step_t 64k cap)  (next #4)
#   4./5. A2C b1 seeds 1 and 2 ON CHIP to ~32k decisions — the 3-seed
#         band probe ROUND4.md §2 queued "for round 5", executed now.
#
# Chip discipline: every python chip user takes the flock chip lock
# (utils/chiplock.py).  Between steps the queue honours:
#   /tmp/chip_yield   — driver's end-of-round bench wants the chip: stop.
#   /tmp/queue_pause  — interactive A/B work wants a window: wait here.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights

DEADLINE=${DEADLINE:-$(date -d '2026-08-20 16:30 UTC' +%s)}

step() { echo "=== $(date +%H:%M:%S) $*"; }
left() { [ -f /tmp/chip_yield ] && { echo 0; return; }; echo $(( DEADLINE - $(date +%s) )); }
min() { echo $(( $1 < $2 ? $1 : $2 )); }
gate() {  # wait out a manual pause; return 1 if the deadline passed
  while [ -f /tmp/queue_pause ]; do
    step "(paused for manual chip work — rm /tmp/queue_pause to resume)"
    sleep 30
  done
  [ "$(left)" -gt "$1" ]
}

# ---- 1. remaining map-100 @2560 hygiene chunks ------------------------
for off in 0 10 20 30 40; do
  [ -f "data/eval/100chunk$off.csv" ] && continue
  gate 1200 || { step "deadline — stopping before map-100 chunk $off"; break; }
  step "1. map 100 @ 2560 chunk seed-offset $off"
  timeout "$(min 1800 $(( $(left) + 600 )))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 10 --seed-offset "$off" --method DQN --model GCN \
    --map-size 100 --max-poses 2560 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out "data/eval/100chunk$off.csv" || true
  git add data/eval && git commit -q \
    -m "eval: map 100 @ max_poses 2560 chunk (seed offset $off)" \
    -- data/eval || true
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
  -m "eval: map 100 @ max_poses 2560 rerun (capacity-forced-lane hygiene)" \
  -- data/eval || true

# ---- 2. map-80 @1792 hygiene rerun ------------------------------------
if gate 2400 && [ ! -f /tmp/map80_done ]; then
  step "2. map 80 @ 1792 rerun (8/50 were capacity-forced at 1280)"
  timeout "$(min 3600 $(( $(left) + 600 )))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method DQN --model GCN \
    --map-size 80 --max-poses 1792 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out data/eval/80_DQN_GCN.csv || true
  touch /tmp/map80_done
  git add data/eval && git commit -q \
    -m "eval: map 80 @ max_poses 1792 rerun (capacity-forced-lane hygiene)" \
    -- data/eval || true
fi

# ---- 3. g-U-Net DQN to the reference band -----------------------------
if gate 1800; then
  G=runs/dqn_gunet_map40_r4
  step "3. g-U-Net DQN band run (resume step_t $(tail -1 $G/temp_reward.csv | cut -d, -f1), target 64000)"
  timeout --signal=TERM --kill-after=120 "$(min 5400 $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method DQN --model g-U-Net --map-size 40 --n-envs 64 --max-poses 256 \
    --decisions 1000 --target-step-t 64000 --observe 2000 \
    --checkpoint-every 100 --slim-every 25 --seed 0 \
    --resume-slim "$G/slim_state.msgpack" \
    --out-dir "$G" || true
  python tools/durable_commit.py --run-dir "$G" \
    --dest data/ckpt/dqn_gunet_map40 --once || true
  git add data/ckpt/dqn_gunet_map40 && git commit -q \
    -m "training snapshot: dqn_gunet_map40 (round-4 band run)" \
    -- data/ckpt/dqn_gunet_map40 || true
fi

# ---- 4./5. A2C b1 seeds 1 & 2 on the chip -----------------------------
# Same exact reference update shape as the CPU seed-0 run (one env, update
# every 40 decisions); fresh starts.  These answer ROUND4.md §2's open
# question: if the 3-seed band contains the reference curve the late gap
# is seed variance, otherwise it's real.
for SEED in 1 2; do
  gate 1800 || { step "deadline — skipping b1 seed $SEED"; break; }
  R=runs/a2c_gcn_map40_r4_b1s$SEED
  D=data/ckpt/a2c_gcn_map40_b1s$SEED
  mkdir -p "$R"
  step "4. A2C b1 seed $SEED on chip (target 32000 decisions)"
  RES=""
  [ -f "$R/slim_state.msgpack" ] && RES="--resume-slim $R/slim_state.msgpack"
  python tools/durable_commit.py --run-dir "$R" --dest "$D" \
    --interval 1500 > "runs/durable_b1s$SEED.log" 2>&1 &
  DUR_PID=$!
  timeout --signal=TERM --kill-after=120 "$(min 10800 $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method A2C --model GCN --map-size 40 --n-envs 1 \
    --decisions 32000 --target-step-t 32000 \
    --checkpoint-every 1000 --slim-every 200 --seed "$SEED" \
    $RES --out-dir "$R" || true
  kill "$DUR_PID" 2>/dev/null
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: a2c_gcn_map40_b1 seed $SEED (3-seed band probe)" \
    -- "$D" || true
done

step "extended window done; chip free"
touch /tmp/round4b_window_done
