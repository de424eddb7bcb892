#!/usr/bin/env bash
# Round-3 distillation campaign, end to end on the real chip:
#   synthetic 256² TB tree -> flagship teacher (attn256d, the quality_256
#   protocol) -> progressive distillation 8/4/2/1 -> FID ladder (student vs
#   undistilled-teacher at equal step count) -> few-step throughput bench.
# Produces the numbers for BASELINE.md's distillation section; eval JSONs
# are copied into artifacts/distill_256/ (data/ is gitignored).
#
# Usage: nohup bash scripts/run_r3_distill_campaign.sh > /tmp/r3_distill.log 2>&1 &
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="data/chest_xray"
RUN="q_attn256d_r3c"
RUN_DIR="data/outputs/TB/experiment_q256_run_$RUN"
PHASE_EPOCHS="${PHASE_EPOCHS:-60}"

echo "=== [1/5] synthetic dataset ==="
python scripts/make_synthetic_dataset.py --root "$ROOT" --resolution 256

echo "=== [2/5] teacher: attn256d 120ep (quality_256 protocol) ==="
if [ ! -f "$RUN_DIR/config.yaml" ]; then
    python -m superdiff_tpu.cli.train --dataset TB \
        --experiment-id q256 --run-id "$RUN" \
        --dataset-root "$ROOT" \
        --set model.preset=attn256d \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set training.num_epochs=120 \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1
fi

echo "=== [3/5] teacher reference FID (DDIM-100, shared extractor) ==="
python -m superdiff_tpu.cli.evaluate --run-dir "$RUN_DIR" \
    --dataset-root "$ROOT" --num-samples 128 --batch-size 32 \
    --method ddim --num-steps 100 --extractor random \
    --out "$RUN_DIR/eval_teacher_ddim100.json"
cat "$RUN_DIR/eval_teacher_ddim100.json"; echo

echo "=== [4/5] progressive distillation 8,4,2,1 ==="
python -m superdiff_tpu.cli.distill --run-dir "$RUN_DIR" \
    --dataset-root "$ROOT" --steps 8,4,2,1 --phase-epochs "$PHASE_EPOCHS"

echo "=== [5/5] FID ladder + throughput ==="
RUN_DIR="$RUN_DIR" ROOT="$ROOT" bash scripts/run_r3_distill_eval.sh

for N in 8 4 2 1; do
    RUN_DIR="$RUN_DIR/distill/s$N" STEPS="$N" \
        python scripts/bench_r3_distill.py || true
done > /tmp/r3_distill_bench.jsonl 2>/tmp/r3_distill_bench.err
cat /tmp/r3_distill_bench.jsonl

mkdir -p artifacts/distill_256
cp "$RUN_DIR"/eval_teacher_ddim*.json artifacts/distill_256/ 2>/dev/null || true
for N in 8 4 2 1; do
    cp "$RUN_DIR/distill/s$N/eval_ddim$N.json" \
       "artifacts/distill_256/eval_s$N.json" 2>/dev/null || true
done
cp /tmp/r3_distill_bench.jsonl artifacts/distill_256/bench.jsonl 2>/dev/null || true
echo "campaign done"
