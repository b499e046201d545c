#!/usr/bin/env bash
# Round-4 eval-window watcher (rebalanced mid-round).
#
# Waits for the DQN 1e6 schedule to finish (supervisor exits 0 when the
# trainer hits --target-step-t), then runs the eval window in VERDICT-r3
# priority order — converged self-trained eval (next #1/#8), g-U-Net band
# run (next #4, hard-capped so it cannot starve the hygiene rerun),
# map-100 hygiene chunks (next #6, committed one by one so partial
# evidence survives), map-80 rerun last — each gated on a hard chip
# deadline so the driver finds the chip free for bench at round end.
#
# Chip choreography is the round-4 way: the trainer stops itself at the
# schedule target (graceful, checkpoint-saved); every evaluator/trainer
# below takes the flock chip lock (utils/chiplock.py).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights

# No NEW chip work after this moment (epoch seconds).  Individual steps
# also get absolute timeouts so nothing can run past the driver's bench.
DEADLINE=${DEADLINE:-$(date -d '2026-08-20 09:10 UTC' +%s)}

step() { echo "=== $(date +%H:%M:%S) $*"; }
# /tmp/chip_yield (tools/bench_yield.py) == the driver's end-of-round bench
# wants the chip: treat as deadline-now so no further chip job starts.
left() { [ -f /tmp/chip_yield ] && { echo 0; return; }; echo $(( DEADLINE - $(date +%s) )); }
min() { echo $(( $1 < $2 ? $1 : $2 )); }

SUP_PID=$(cat /tmp/sup_dqn.pid 2>/dev/null || echo 0)
step "watching supervisor pid $SUP_PID (DQN -> 1e6)"
while kill -0 "$SUP_PID" 2>/dev/null; do
  if [ "$(left)" -le 0 ]; then
    step "deadline reached with trainer still running — graceful stop"
    python tools/stop_training.py --pid-file /tmp/sup_dqn.pid --grace 240 || true
    break
  fi
  sleep 60
done
step "eval window opens ($(left)s to deadline)"

step "0. durable-commit final DQN state"
python tools/durable_commit.py --run-dir runs/dqn_gcn_map40_r3 \
  --dest data/ckpt/dqn_gcn_map40 --once || true

if [ "$(left)" -gt 600 ]; then
  step "1. converged self-trained eval on the reference's own test worlds"
  timeout "$(min 1800 $(( $(left) - 120 )))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method DQN --model GCN --map-size 40 --ref-worlds \
    --checkpoint runs/dqn_gcn_map40_r3/MyModel.msgpack \
    --out data/eval/40_DQN_GCN_selftrained_refworlds.csv || true
  git add data/eval && git commit -q \
    -m "eval: self-trained DQN+GCN on the reference's test worlds (converged 1e6 snapshot)" \
    -- data/eval || true
fi

# g-U-Net gets a real budget but RESERVES 1500s for the map-100 hygiene
# chunks below (round-3 verdict listed both; neither may starve the other).
GBUDGET=$(min 2700 $(( $(left) - 1500 )))
if [ "$GBUDGET" -gt 900 ]; then
  step "2. g-U-Net DQN toward the reference band (@ P=256, ${GBUDGET}s budget)"
  # resume the round-3 smoke (step_t 5120, observe-phase only — learning had
  # barely started) so the committed curve extends instead of restarting;
  # replay re-warms, epsilon/target schedules continue from 5120
  G=runs/dqn_gunet_map40_r4
  if [ ! -d "$G" ]; then
    mkdir -p "$G"
    cp data/ckpt/dqn_gunet_map40/slim_state.msgpack \
       data/ckpt/dqn_gunet_map40/MyModel.msgpack \
       data/ckpt/dqn_gunet_map40/reward_data.csv \
       data/ckpt/dqn_gunet_map40/temp_reward.csv \
       data/ckpt/dqn_gunet_map40/temp_loss.csv "$G/" 2>/dev/null || true
  fi
  timeout --signal=TERM --kill-after=60 "$GBUDGET" \
    python -m drl_graph_exploration_tpu.train \
    --method DQN --model g-U-Net --map-size 40 --n-envs 64 --max-poses 256 \
    --decisions 400 --target-step-t 26000 --observe 2000 \
    --checkpoint-every 100 --slim-every 25 --seed 0 \
    --resume-slim "$G/slim_state.msgpack" \
    --out-dir "$G" || true
  python tools/durable_commit.py --run-dir "$G" \
    --dest data/ckpt/dqn_gunet_map40 --once || true
  git add data/ckpt/dqn_gunet_map40 && git commit -q \
    -m "training snapshot: dqn_gunet_map40 (round-4 band run)" \
    -- data/ckpt/dqn_gunet_map40 || true
fi

# map-100 hygiene rerun @2560 (round 3's @2048 merge had 9/50 episodes
# capacity-forced).  Each chunk ~10-15 min; commit chunks individually so
# partial evidence survives an early round end; merge replaces the
# shipping CSV only when all five chunks exist.
for off in 0 10 20 30 40; do
  [ -f "data/eval/100chunk$off.csv" ] && continue
  [ "$(left)" -gt 1080 ] || { step "deadline — stopping before chunk $off"; break; }
  step "3. map 100 @ 2560 chunk seed-offset $off"
  timeout "$(min 1500 $(( $(left) - 240 )))" \
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

# map-80 has the same disease: the shipping CSV (commit 92146c6, @1280) has
# 8/50 capacity-forced episodes (runs/gap4.log) — rerun with headroom.
if [ "$(left)" -gt 2400 ]; then
  step "4. map 80 @ 1792 rerun (8/50 were capacity-forced at 1280)"
  timeout "$(( $(left) - 240 ))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method DQN --model GCN \
    --map-size 80 --max-poses 1792 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out data/eval/80_DQN_GCN.csv || true
  git add data/eval && git commit -q \
    -m "eval: map 80 @ max_poses 1792 rerun (capacity-forced-lane hygiene)" \
    -- data/eval || true
fi

step "window done; chip free"
touch /tmp/round4_window_done
