#!/usr/bin/env bash
# The b1 late-curve experiment (ROUND4.md §2 3-seed answer -> suspect list):
# the ONE structural difference left between our A2C b1 runs and the
# reference's training loop is the optimizer lifetime — the reference
# re-creates its torch Adam every 1e4-decision subprocess epoch
# (policy.py:306 + train.py:82-84), i.e. Adam moments + bias-correction
# warm-restart every 10k decisions; ours is one continuous Adam.
#
# A/B: fresh b1 runs (seeds 10, 11) WITH --adam-restart 10000 to 32k.
# Compare against the committed continuous-Adam band
# (data/ckpt/a2c_gcn_map40_b1{,s1,s2}): if the restart runs climb toward
# the reference's -0.03..-0.07 late curve, the gap is explained (and the
# fix is a config knob, not a bug); if they plateau at -0.17..-0.21 the
# suspect is eliminated and round 5 moves to policy-entropy logging.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

DEADLINE=${DEADLINE:-$(date -d '2026-08-21 18:10 UTC' +%s)}
step() { echo "=== $(date +%H:%M:%S) $*"; }
left() { [ -f /tmp/chip_yield ] && { echo 0; return; }; echo $(( DEADLINE - $(date +%s) )); }
min() { echo $(( $1 < $2 ? $1 : $2 )); }
gate() {
  while [ -f /tmp/queue_pause ]; do step "(paused)"; sleep 30; done
  [ "$(left)" -gt "$1" ]
}

step "waiting for the afternoon queue"
while [ ! -f /tmp/round4d_window_done ]; do sleep 60; done

for SEED in 10 11; do
  gate 1800 || { step "deadline — stopping before seed $SEED"; break; }
  R=runs/a2c_b1_adamrestart_s$SEED
  D=data/ckpt/a2c_b1_adamrestart_s$SEED
  mkdir -p "$R" "$D"
  RES=""
  [ -f "$R/slim_state.msgpack" ] && RES="--resume-slim $R/slim_state.msgpack"
  step "b1 + adam-restart 10000, seed $SEED (target 32000)"
  python tools/durable_commit.py --run-dir "$R" --dest "$D" \
    --interval 1500 > "runs/durable_ar_s$SEED.log" 2>&1 &
  DUR=$!
  timeout --signal=TERM --kill-after=120 "$(min 7200 $(( $(left) - 300 )))" \
    python -m drl_graph_exploration_tpu.train \
    --method A2C --model GCN --map-size 40 --n-envs 1 \
    --decisions 32000 --target-step-t 32000 --adam-restart 10000 \
    --checkpoint-every 1000 --slim-every 200 --seed "$SEED" \
    $RES --out-dir "$R" > "runs/ar_s${SEED}_train.log" 2>&1 || true
  kill "$DUR" 2>/dev/null
  python tools/durable_commit.py --run-dir "$R" --dest "$D" --once || true
  git add "$D" && git commit -q \
    -m "training snapshot: a2c b1 adam-restart probe seed $SEED" -- "$D" || true
  tail -2 "$D/temp_reward.csv" || true
done

step "adam-restart probe done"
touch /tmp/round4e_done
