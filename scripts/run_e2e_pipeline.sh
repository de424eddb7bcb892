#!/usr/bin/env bash
# End-to-end pipeline: synthetic dataset -> train TB + PNEUMONIA models ->
# sample -> evaluate (FID + Ito log-densities) -> compare panels.
#
# This is the full chain the reference only gestures at (its checkpoints
# are never loaded and nothing computes a metric — SURVEY.md §5.3/§6);
# here it runs as one reproducible script. On the real TPU expect a few
# minutes of remote compile per distinct jitted shape.
#
# Usage: bash scripts/run_e2e_pipeline.sh [RES] [EPOCHS] [BASE_CH] [EXP_ID]
# Env knobs: BATCH, PRESET, N_EVAL, EVAL_STEPS, EXTRA_SETS (extra --set
# training overrides, space-separated) — tiny-scale CPU smoke vs real run.
set -euo pipefail
cd "$(dirname "$0")/.."

RES="${1:-64}"
EPOCHS="${2:-80}"
BASE_CH="${3:-32}"
EXP="${4:-e2e}"
ROOT="data/chest_xray"
BATCH="${BATCH:-64}"
PRESET="${PRESET:-}"
N_EVAL="${N_EVAL:-128}"
EVAL_BATCH="${EVAL_BATCH:-32}"
SP_BATCH="${SP_BATCH:-16}"
EVAL_STEPS="${EVAL_STEPS:-100}"
EXTRA_SETS="${EXTRA_SETS:-}"

if [ ! -d "$ROOT/TB/train" ]; then
    python scripts/make_synthetic_dataset.py --root "$ROOT" --resolution 256
fi

COMMON=(--dataset-root "$ROOT"
        --set "training.resolution=$RES"
        --set "training.batch_size=$BATCH"
        --set "training.num_epochs=$EPOCHS"
        --set "model.base_channels=$BASE_CH"
        --set training.vis_every=40
        --set training.save_every=20
        --set training.keep_checkpoints=2)
if [ -n "$PRESET" ]; then COMMON+=(--set "model.preset=$PRESET"); fi
for S in $EXTRA_SETS; do COMMON+=(--set "$S"); done

for TASK in TB PNEUMONIA; do
    RUN_ID="$(echo "${PRESET:-r}${RES}_${TASK}" | tr '[:upper:]' '[:lower:]')"
    echo "=== training $TASK at ${RES}px (run $RUN_ID) ==="
    python -m superdiff_tpu.cli.train --dataset "$TASK" \
        --experiment-id "$EXP" --run-id "$RUN_ID" "${COMMON[@]}"
done

TB_RUN="data/outputs/TB/experiment_${EXP}_run_$(echo "${PRESET:-r}${RES}_tb" | tr '[:upper:]' '[:lower:]')"
PN_RUN="data/outputs/PNEUMONIA/experiment_${EXP}_run_$(echo "${PRESET:-r}${RES}_pneumonia" | tr '[:upper:]' '[:lower:]')"

echo "=== evaluating TB (FID + superposed log-densities vs PNEUMONIA) ==="
python -m superdiff_tpu.cli.evaluate --run-dir "$TB_RUN" \
    --run-dir2 "$PN_RUN" --dataset-root "$ROOT" \
    --num-samples "$N_EVAL" --batch-size "$EVAL_BATCH" --method ddim --num-steps "$EVAL_STEPS"

echo "=== evaluating PNEUMONIA ==="
python -m superdiff_tpu.cli.evaluate --run-dir "$PN_RUN" \
    --dataset-root "$ROOT" \
    --num-samples "$N_EVAL" --batch-size "$EVAL_BATCH" --method ddim --num-steps "$EVAL_STEPS"

echo "=== superposed sampling (OR / AND) + compare panel ==="
python -m superdiff_tpu.cli.sample --run-dir "$TB_RUN" --run-dir2 "$PN_RUN" \
    --mode or --batch-size "$SP_BATCH" --out "$TB_RUN/superposed_or"
python -m superdiff_tpu.cli.sample --run-dir "$TB_RUN" --run-dir2 "$PN_RUN" \
    --mode and --batch-size "$SP_BATCH" --out "$TB_RUN/superposed_and"
python -m superdiff_tpu.cli.visualize --compare \
    --run-dir "$TB_RUN" --run-dir2 "$PN_RUN" \
    --out "$TB_RUN/compare" || true

echo "pipeline done: $TB_RUN $PN_RUN"
