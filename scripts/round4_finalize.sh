#!/usr/bin/env bash
# Round-4 finalization (CPU-only; run ~30 min before round end):
# stop the A2C b1 validation run gracefully, durable-commit it, and gather
# every end-of-round number (curve milestones, overlays, eval summaries)
# into one log for the doc pass.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

step() { echo "=== $(date +%H:%M:%S) $*"; }

step "1. graceful A2C b1 stop (SIGTERM -> checkpoint-save -> exit 0)"
A2C_PID=$(cat /tmp/a2c_b1.pid 2>/dev/null || echo 0)
if kill -0 "$A2C_PID" 2>/dev/null; then
  kill -TERM "$A2C_PID"
  for _ in $(seq 60); do kill -0 "$A2C_PID" 2>/dev/null || break; sleep 5; done
fi
python tools/durable_commit.py --run-dir runs/a2c_gcn_map40_r4_b1 \
  --dest data/ckpt/a2c_gcn_map40_b1 --once || true

step "2. A2C b1 vs reference curve (matched decision counts)"
python - <<'EOF'
import csv
with open('data/ref_curves/A2C_GCN_avg_reward.csv') as f:
    r = list(csv.reader(f))[1:]
ref = [(float(a), float(b)) for a, b in r]
with open('runs/a2c_gcn_map40_r4_b1/temp_reward.csv') as f:
    ours = [(float(a), float(b)) for a, b in csv.reader(f)]
print(f"b1 run: {ours[-1][0]:.0f} decisions, final trailing avg {ours[-1][1]:+.4f}")
for x, y in ours[:: max(1, len(ours) // 12)] + [ours[-1]]:
    near = min(ref, key=lambda p: abs(p[0] - x))
    print(f"dec {x:7.0f}  ours {y:+.4f}  ref {near[1]:+.4f} (at {near[0]:.0f})  "
          f"delta {y - near[1]:+.4f}")
EOF

step "3. overlay PNGs"
python scripts/compare_training_curve.py \
  runs/a2c_gcn_map40_r4_b1/temp_reward.csv \
  --label "A2C+GCN n_envs=1, ref update shape (ours, TPU-framework on CPU)" \
  --out data/eval/a2c_b1_curve.png || true
python scripts/compare_training_curve.py \
  data/ckpt/dqn_gcn_map40/temp_reward.csv \
  --label "DQN+GCN n_envs=64 (ours, one TPU v5e)" \
  --out data/eval/training_curve.png || true

step "4. DQN curve milestones (full run)"
python scripts/curve_milestones.py runs/dqn_gcn_map40_r3 || true

step "5. eval CSV summaries (current tree)"
for f in data/eval/40_DQN_GCN_selftrained_refworlds.csv \
         data/eval/100_DQN_GCN.csv data/eval/80_DQN_GCN.csv; do
  [ -f "$f" ] && python scripts/summarize_eval.py "$f" --steps 300 600
done

step "6. g-U-Net curve tail"
tail -5 data/ckpt/dqn_gunet_map40/temp_reward.csv 2>/dev/null || true

step "finalize data gathered — write the docs"
