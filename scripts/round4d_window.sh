#!/usr/bin/env bash
# Round-4 session-3 AFTERNOON queue (runs after round4c_window.sh touches
# /tmp/round4c_window_done).  The split-scan learner freed most of the
# planned chip budget (g-U-Net 64k finished in ~35 min instead of 4 h), so
# the afternoon deepens the training evidence and refreshes the artifacts:
#   1. g-U-Net extension 64k -> 100k   (sustain the -0.10 band crossing)
#   2. GG-NN extension 26k -> 64k      (deepen the third-family curve)
#   3. A2C b1 seed-0 chip continuation -> 64k (the CPU run does ~1 dec/s;
#      the chip does ~12.7 — stop the CPU trainer gracefully and continue
#      from its slim state on the chip)
#   4. profile_phases refresh at the split-scan learner (docs artifact)
#   5. A2C b1 eval row on the reference's test worlds
#   6. bench refreshes (primitive metric + decisions)
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
W=/root/reference/data/torch_weights

DEADLINE=${DEADLINE:-$(date -d '2026-08-21 18:10 UTC' +%s)}
step() { echo "=== $(date +%H:%M:%S) $*"; }
left() { [ -f /tmp/chip_yield ] && { echo 0; return; }; echo $(( DEADLINE - $(date +%s) )); }
min() { echo $(( $1 < $2 ? $1 : $2 )); }
gate() {
  while [ -f /tmp/queue_pause ]; do
    step "(paused — rm /tmp/queue_pause to resume)"
    sleep 30
  done
  [ "$(left)" -gt "$1" ]
}

step "waiting for the morning queue to finish"
while [ ! -f /tmp/round4c_window_done ]; do sleep 60; done

train_ext() { # train_ext <run> <durable> <model> <target> <budget> [extra...]
  local R=$1 D=$2 MODEL=$3 TARGET=$4 BUDGET=$5; shift 5
  mkdir -p "$R" "$D"
  for f in slim_state.msgpack temp_reward.csv reward_data.csv temp_loss.csv; do
    [ -f "$R/$f" ] || { [ -f "$D/$f" ] && cp "$D/$f" "$R/$f"; }
  done
  python tools/durable_commit.py --run-dir "$R" --dest "$D" \
    --interval 1200 > "runs/durable_$(basename "$R").log" 2>&1 &
  local DUR=$!
  timeout --signal=TERM --kill-after=120 "$(min "$BUDGET" $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method DQN --model "$MODEL" --map-size 40 --n-envs 64 --max-poses 256 \
    --decisions 1000 --target-step-t "$TARGET" --observe 2000 \
    --checkpoint-every 100 --slim-every 25 --seed 0 \
    --resume-slim "$R/slim_state.msgpack" "$@" \
    --out-dir "$R" >> "runs/$(basename "$R").log" 2>&1 || true
  kill "$DUR" 2>/dev/null
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: $(basename "$D") (session-3 extension)" -- "$D" || true
  tail -2 "$D/temp_reward.csv" || true
}

# ---- 1. g-U-Net 64k -> 100k ------------------------------------------
gate 1800 && { step "1. g-U-Net extension to 100k"; \
  train_ext runs/dqn_gunet_map40_r4 data/ckpt/dqn_gunet_map40 g-U-Net 100000 3600; }

# ---- 2. GG-NN 26k -> 64k ---------------------------------------------
gate 1800 && { step "2. GG-NN extension to 64k"; \
  train_ext runs/dqn_ggnn_map40_r4 data/ckpt/dqn_ggnn_map40 GG-NN 64000 3600; }

# ---- 3. A2C b1 seed-0: move from CPU to chip, -> 64k ------------------
if gate 1800; then
  step "3. stop the CPU b1 trainer (SIGTERM -> checkpoint-save)"
  B1_PID=$(cat /tmp/a2c_b1.pid 2>/dev/null || echo 0)
  if kill -0 "$B1_PID" 2>/dev/null; then
    kill -TERM "$B1_PID"
    for _ in $(seq 120); do kill -0 "$B1_PID" 2>/dev/null || break; sleep 5; done
  fi
  R=runs/a2c_gcn_map40_r4_b1; D=data/ckpt/a2c_gcn_map40_b1
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  step "3. b1 seed-0 chip continuation (resume step_t $(tail -1 $R/temp_reward.csv | cut -d, -f1), target 64000)"
  python tools/durable_commit.py --run-dir "$R" --dest "$D" \
    --interval 1500 > runs/durable_b1chip.log 2>&1 &
  DUR=$!
  timeout --signal=TERM --kill-after=120 "$(min 7200 $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method A2C --model GCN --map-size 40 --n-envs 1 \
    --decisions 64000 --target-step-t 64000 \
    --checkpoint-every 1000 --slim-every 200 --seed 0 \
    --resume-slim "$R/slim_state.msgpack" \
    --out-dir "$R" > runs/b1chip_train.log 2>&1 || true
  kill "$DUR" 2>/dev/null
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: a2c_gcn_map40_b1 seed 0 to 64k (chip continuation)" \
    -- "$D" || true
fi

# ---- 4. profile_phases refresh ---------------------------------------
gate 900 && { step "4. profile_phases refresh"; \
  timeout 2400 python tools/profile_phases.py 256 64 \
    > data/ab/profile_phases_r4c.txt 2>&1 || true; \
  git add data/ab && git commit -q \
    -m "profile: phase decomposition at the split-scan learner" -- data/ab || true; }

# ---- 5. A2C b1 eval row on the reference's test worlds ----------------
gate 1200 && { step "5. A2C b1 self-trained eval (ref worlds)"; \
  timeout 2400 python -m drl_graph_exploration_tpu.evaluate --batched \
    --episodes 50 --method A2C --model GCN --map-size 40 --ref-worlds \
    --checkpoint data/ckpt/a2c_gcn_map40_b1/MyModel.msgpack \
    --out data/eval/40_A2C_GCN_selftrained_refworlds.csv \
    > runs/eval_a2c_b1.log 2>&1 || true; \
  git add data/eval && git commit -q \
    -m "eval: self-trained A2C+GCN (b1 64k) on the reference's test worlds" \
    -- data/eval || true; }

# ---- 6. bench refreshes ----------------------------------------------
gate 600 && { step "6. bench refresh (primitive + decisions)"; \
  timeout 1800 python bench.py > /tmp/bench_prim.log 2>&1 || true; \
  timeout 1800 python bench.py --decisions > /tmp/bench_dec2.log 2>&1 || true; \
  grep -h '"metric"' /tmp/bench_dec2.log > data/ab/bench_decisions_r4.txt || true; \
  git add data/ab && git commit -q -m "bench: decisions refresh" -- data/ab || true; \
  tail -1 /tmp/bench_prim.log; }

step "afternoon queue done; chip free"
touch /tmp/round4d_window_done
