#!/usr/bin/env bash
# Round-4 follow-ups after run_r4_chip_queue.sh (kept separate because a
# running bash script must not be edited):
#   [1] DPM++-10 teacher evals under BOTH shared extractors — the missing
#       comparison point for the distillation verdict (students vs the
#       best non-distilled fast sampler, under the conv-FID metric that
#       decides the few-step regime).
#   [2] wide-slim quality leg (preset wide256 + blocks (1,1,2,2,2)) — the
#       fastest wide variant's 120ep FID, completing the width table.
#   [3] weak-scaling table on the CPU mesh (chip idle by now).
#
# Usage: nohup bash scripts/run_r4_post_queue.sh > /tmp/r4_post.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT="data/chest_xray"
TEACH="data/outputs/TB/experiment_q256_run_q_attn256d_r3c"
RN18="artifacts/extractors/resnet18_rand_seed1234.npz"

echo "========== [1] DPM++-10 dual-extractor evals =========="
if [ -d "$TEACH" ]; then
    for ex in random resnet18; do
        OUT="$TEACH/eval_dpmpp10_$ex.json"
        [ -f "$OUT" ] && { echo "--- skip $OUT"; continue; }
        EXTRA=()
        [ "$ex" = resnet18 ] && EXTRA=(--extractor-checkpoint "$RN18")
        python -m superdiff_tpu.cli.evaluate --run-dir "$TEACH" \
            --dataset-root "$ROOT" --num-samples 128 --batch-size 32 \
            --method dpmpp --num-steps 10 --extractor "$ex" \
            "${EXTRA[@]}" --out "$OUT" && { cat "$OUT"; echo; }
        cp "$OUT" artifacts/distill_256/ 2>/dev/null
    done
fi

echo "========== [2] wide-slim quality leg =========="
if [ "${SKIP_WIDESLIM:-0}" != "1" ]; then
    RUN="q_wideslim_tb"
    DIR="data/outputs/TB/experiment_q256_run_$RUN"
    if [ ! -f "$DIR/config.yaml" ]; then
        python -m superdiff_tpu.cli.train --dataset TB \
            --experiment-id q256 --run-id "$RUN" \
            --dataset-root "$ROOT" \
            --set model.preset=wide256 \
            --set model.num_res_blocks=1,1,2,2,2 \
            --set training.resolution=256 \
            --set training.batch_size=32 \
            --set training.num_epochs=120 \
            --set training.lr_schedule=cosine \
            --set training.warmup_steps=100 \
            --set training.vis_every=60 \
            --set training.save_every=60 \
            --set training.keep_checkpoints=1
    fi
    for spec in "eval_rand512.json:random:512" "eval_rn18_512.json:resnet18:512"; do
        OUT="${spec%%:*}"; rest="${spec#*:}"; ex="${rest%%:*}"; n="${rest##*:}"
        [ -f "$DIR/$OUT" ] && continue
        EXTRA=()
        [ "$ex" = resnet18 ] && EXTRA=(--extractor-checkpoint "$RN18")
        python -m superdiff_tpu.cli.evaluate --run-dir "$DIR" \
            --dataset-root "$ROOT" --num-samples "$n" --batch-size 32 \
            --method ddim --num-steps 100 --extractor "$ex" \
            "${EXTRA[@]}" --out "$DIR/$OUT" && { cat "$DIR/$OUT"; echo; }
        cp "$DIR/$OUT" "artifacts/quality_256/r4_512/${RUN}_${OUT#eval_}" 2>/dev/null
    done
fi

echo "========== [3] weak-scaling table (CPU mesh) =========="
if [ ! -s artifacts/scaling/bench.jsonl ]; then
    mkdir -p artifacts/scaling
    python scripts/bench_r4_scaling.py > /tmp/r4_scaling.jsonl \
        2>/tmp/r4_scaling.log && cp /tmp/r4_scaling.jsonl \
        artifacts/scaling/bench.jsonl
    cat artifacts/scaling/bench.jsonl || true
fi

echo "r4 post-queue done"
