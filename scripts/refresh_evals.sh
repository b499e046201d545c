#!/usr/bin/env bash
# Refresh every published eval CSV on the CURRENT evaluator (VERDICT r2
# item 3: the round-2 40/60/80/100 CSVs predate the stale-raster fix).
# Serializes on the single TPU tunnel — run only when no training process
# owns the chip.  ~30 min warm.
#
# Usage: bash scripts/refresh_evals.sh [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-data/eval}
W=/root/reference/data/torch_weights

run() {
  echo "=== $*" >&2
  PYTHONPATH=/root/repo:${PYTHONPATH:-} timeout 3000 \
    python -m drl_graph_exploration_tpu.evaluate --batched --episodes 50 "$@"
}

# imported reference weights, our world generator (round-1 protocol)
run --method DQN --model GCN --map-size 40  --torch-weights $W/DQN_GCN/MyModel.pt --out $OUT/40_DQN_GCN.csv
run --method A2C --model GCN --map-size 40  --torch-weights $W/A2C_GCN/MyModel.pt --out $OUT/40_A2C_GCN.csv
run --method DQN --model GCN --map-size 60  --torch-weights $W/DQN_GCN/MyModel.pt --out $OUT/60_DQN_GCN.csv
run --method DQN --model GCN --map-size 80  --torch-weights $W/DQN_GCN/MyModel.pt --out $OUT/80_DQN_GCN.csv
run --method DQN --model GCN --map-size 100 --torch-weights $W/DQN_GCN/MyModel.pt --out $OUT/100_DQN_GCN.csv
# matched worlds (the reference's own 50 test worlds, bit-exact)
run --method DQN --model GCN --map-size 40  --torch-weights $W/DQN_GCN/MyModel.pt --ref-worlds --out $OUT/40_DQN_GCN_refworlds.csv

# self-trained weights, if the round-3 training snapshot exists
CKPT=data/ckpt/dqn_gcn_map40/MyModel.msgpack
if [ -f "$CKPT" ]; then
  run --method DQN --model GCN --map-size 40 --checkpoint "$CKPT" --ref-worlds --out $OUT/40_DQN_GCN_selftrained_refworlds.csv
fi

echo "done; compare with: python scripts/compare_eval.py" >&2
