#!/usr/bin/env bash
# Preset quality A/B at 256²: train the same TB dataset under each preset,
# then evaluate FID on the test split with the shared resnet-free extractor.
# Produces the quality-vs-throughput table BASELINE.md pairs with the
# sampling-throughput A/B (fast256 trades quality for speed; attn256 adds
# a 32² attention level through the Pallas flash kernel).
#
# Usage: bash scripts/run_quality_ab.sh [EPOCHS] [PRESET ...]
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${1:-120}"
shift || true
PRESETS=("${@:-eff256 fast256 attn256}")
[ $# -eq 0 ] && PRESETS=(eff256 fast256 attn256)
ROOT="data/chest_xray"
N_EVAL="${N_EVAL:-128}"

if [ ! -d "$ROOT/TB/train" ]; then
    python scripts/make_synthetic_dataset.py --root "$ROOT" --resolution 256
fi

for P in "${PRESETS[@]}"; do
    RUN="q_${P}_tb"
    echo "=== training TB preset $P (${EPOCHS} epochs) ==="
    python -m superdiff_tpu.cli.train --dataset TB \
        --experiment-id q256 --run-id "$RUN" \
        --dataset-root "$ROOT" \
        --set "model.preset=$P" \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set "training.num_epochs=$EPOCHS" \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1
    RUN_DIR="data/outputs/TB/experiment_q256_run_$RUN"
    echo "=== evaluating $P ==="
    # own-model feature space (per-run quality signal)...
    python -m superdiff_tpu.cli.evaluate --run-dir "$RUN_DIR" \
        --dataset-root "$ROOT" --num-samples "$N_EVAL" --batch-size 32 \
        --method ddim --num-steps 100
    cat "$RUN_DIR/eval.json"
    # ...and ONE fixed extractor shared by every preset — the only FIDs
    # comparable ACROSS runs (EXTRACTOR=resnet18 EXTRACTOR_CKPT=... for a
    # pretrained space; default: seeded random projection)
    python -m superdiff_tpu.cli.evaluate --run-dir "$RUN_DIR" \
        --dataset-root "$ROOT" --num-samples "$N_EVAL" --batch-size 32 \
        --method ddim --num-steps 100 \
        --extractor "${EXTRACTOR:-random}" \
        ${EXTRACTOR_CKPT:+--extractor-checkpoint "$EXTRACTOR_CKPT"} \
        --out "$RUN_DIR/eval_shared_extractor.json"
    cat "$RUN_DIR/eval_shared_extractor.json"
done
echo "quality A/B done"
