#!/usr/bin/env bash
# Round-3 sampler-quality A/B on a trained 256² flagship: does the fast
# solver hold FID, and is the lane-packed norm chain FID-neutral?
#
# Trains attn256d once (unless RUN_DIR is given), then evaluates the SAME
# checkpoint under one shared fixed extractor with:
#   ddim-100      (the quality_256 baseline protocol)
#   dpmpp-20      (the round-3 fast solver, log-SNR nodes)
#   dpmpp-10      (the aggressive point: 10 model calls)
#
# Usage: bash scripts/run_r3_sampler_fid.sh [EPOCHS]
#        RUN_DIR=data/outputs/TB/experiment_q256_run_q_attn256d_tb \
#            bash scripts/run_r3_sampler_fid.sh   # reuse a trained run
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${1:-120}"
ROOT="data/chest_xray"
N_EVAL="${N_EVAL:-128}"
P=attn256d

if [ ! -d "$ROOT/TB/train" ]; then
    python scripts/make_synthetic_dataset.py --root "$ROOT" --resolution 256
fi

if [ -z "${RUN_DIR:-}" ]; then
    RUN="q_${P}_tb"
    echo "=== training TB $P (${EPOCHS} epochs) ==="
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
fi

eval_one () {  # name method steps [env...]
    local name="$1" method="$2" steps="$3"
    echo "=== evaluate $name ==="
    python -m superdiff_tpu.cli.evaluate --run-dir "$RUN_DIR" \
        --dataset-root "$ROOT" --num-samples "$N_EVAL" --batch-size 32 \
        --method "$method" --num-steps "$steps" \
        --extractor random \
        --out "$RUN_DIR/eval_${name}.json"
    cat "$RUN_DIR/eval_${name}.json"
}

eval_one ddim100 ddim 100
eval_one dpmpp20 dpmpp 20
eval_one dpmpp10 dpmpp 10
echo "sampler FID A/B done: $RUN_DIR/eval_*.json"
