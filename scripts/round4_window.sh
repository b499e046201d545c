#!/usr/bin/env bash
# Round-4 eval-window watcher.
#
# Waits for the DQN 1e6 schedule to finish (supervisor exits 0 when the
# trainer hits --target-step-t), then runs the eval window in VERDICT-r3
# priority order — converged self-trained eval (next #1/#8), g-U-Net band
# run (next #4), map-100 hygiene rerun (next #6) — each gated on a hard
# chip deadline so the driver finds the chip free for bench at round end.
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
DEADLINE=${DEADLINE:-$(date -d '2026-08-20 08:10 UTC' +%s)}

step() { echo "=== $(date +%H:%M:%S) $*"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

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
  timeout "$(( $(left) > 3600 ? 3600 : $(left) ))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method DQN --model GCN --map-size 40 --ref-worlds \
    --checkpoint runs/dqn_gcn_map40_r3/MyModel.msgpack \
    --out data/eval/40_DQN_GCN_selftrained_refworlds.csv || true
  git add data/eval && git commit -q \
    -m "eval: self-trained DQN+GCN on the reference's test worlds (converged 1e6 snapshot)" \
    -- data/eval || true
fi

if [ "$(left)" -gt 1500 ]; then
  step "2. g-U-Net DQN toward the reference band (@ P=256)"
  # resume the round-3 smoke (step_t 5120, observe-phase only — learning had
  # barely started) so the committed curve extends instead of restarting;
  # replay re-warms 2000 steps, epsilon/target schedules continue from 5120
  G=runs/dqn_gunet_map40_r4
  if [ ! -d "$G" ]; then
    mkdir -p "$G"
    cp data/ckpt/dqn_gunet_map40/slim_state.msgpack \
       data/ckpt/dqn_gunet_map40/MyModel.msgpack \
       data/ckpt/dqn_gunet_map40/reward_data.csv \
       data/ckpt/dqn_gunet_map40/temp_reward.csv \
       data/ckpt/dqn_gunet_map40/temp_loss.csv "$G/" 2>/dev/null || true
  fi
  timeout "$(( $(left) > 4500 ? 4500 : $(left) - 300 ))" \
    python -m drl_graph_exploration_tpu.train \
    --method DQN --model g-U-Net --map-size 40 --n-envs 64 --max-poses 256 \
    --decisions 400 --target-step-t 26000 --observe 2000 \
    --checkpoint-every 100 --slim-every 25 --seed 0 \
    --resume-slim "$G/slim_state.msgpack" \
    --out-dir "$G" || true
  python tools/durable_commit.py --run-dir "$G" \
    --dest data/ckpt/dqn_gunet_map40 --once || true
fi

# map-100 hygiene rerun: per-chunk deadline gate (each chunk ~8-10 min)
ran_chunks=0
for off in 0 10 20 30 40; do
  [ "$(left)" -gt 900 ] || { step "deadline — stopping before chunk $off"; break; }
  step "3. map 100 @ 2560 chunk seed-offset $off"
  timeout "$(( $(left) - 240 ))" \
    python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 10 --seed-offset "$off" --method DQN --model GCN \
    --map-size 100 --max-poses 2560 --torch-weights $W/DQN_GCN/MyModel.pt \
    --out "data/eval/100chunk$off.csv" && ran_chunks=$((ran_chunks+1))
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
if [ "$(left)" -gt 1500 ]; then
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
