#!/usr/bin/env bash
# Round-5 SuperDiff distillation campaign (VERDICT r4 #6): compress the
# two-model OR superposition (~0.84 samples/sec) into few-step students.
#
#   [1] materialize the superposition: 2048/128/512 samples from the TRUE
#       Itô OR sampler (flagship TB + PNEU pair) -> data/super_or tree
#   [2] train one flagship-preset model on that tree (120ep protocol) —
#       the "base student": a single 9ms-denoiser model of the superposed
#       distribution
#   [3] FID of the base student vs the superposed test split (random +
#       trained-cnn extractors)
#   [4] progressive distillation 8/4/2/1 on the superposed tree
#   [5] student FID ladder vs the superposed test split
#   [6] few-step throughput of s1/s4 (same bench as the r3/r4 ladders)
#   [7] semantic check: trained-classifier label distribution of the
#       teacher set vs base-student vs s1 samples (+ the two source
#       models as reference points) — the superposed TB/PNEU mix must
#       survive distillation
#
# Idempotent: every leg skips when its output exists.
# Usage: nohup bash scripts/run_r5_superdistill.sh > /tmp/r5_super.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

TB_RUN="${TB_RUN:-data/outputs/TB/experiment_q256_run_q_wide256_tb}"
PNEU_RUN="${PNEU_RUN:-data/outputs/PNEUMONIA/experiment_q256_run_q_wide256_pneu}"
PRESET="${PRESET:-wide256}"
SROOT="data/super_or"
STASK="SUPERPOSED"
CNN="artifacts/extractors/smallcnn_trained_256.npz"
ART="artifacts/superdistill_256"
mkdir -p "$ART"

run_retry () {
    local secs="$1"; shift
    local try
    for try in 1 2 3; do
        timeout --kill-after=20 "$secs" "$@" && return 0
        echo "!!! attempt $try failed/timed out: $*" >&2
        sleep 15
    done
    return 1
}

# Priority inversion under the round-5 clock (VERDICT #3/#5 outrank #6):
# land the flagship ledger + serving numbers before the long superdiff
# campaign. run_r5_ledger.sh is idempotent — a no-op if already done.
bash scripts/run_r5_ledger.sh > /tmp/r5_ledger.log 2>&1 || true

[ -d "$TB_RUN" ] || { echo "missing $TB_RUN"; exit 1; }
[ -d "$PNEU_RUN" ] || { echo "missing $PNEU_RUN"; exit 1; }

echo "========== [1] superposed dataset tree =========="
run_retry 7200 python scripts/build_super_tree.py \
    --run-dir "$TB_RUN" --run-dir2 "$PNEU_RUN" \
    --root "$SROOT" --task "$STASK" \
    --train 1024 --val 128 --test 384 || exit 1
cp "$SROOT/$STASK/meta.json" "$ART/tree_meta.json" 2>/dev/null

echo "========== [2] base student (flagship preset, 120ep) =========="
SD="data/outputs/$STASK/experiment_q256_run_q_super_base"
if [ ! -f "$SD/config.yaml" ]; then
    run_retry 7200 python -m superdiff_tpu.cli.train --dataset "$STASK" \
        --experiment-id q256 --run-id q_super_base \
        --dataset-root "$SROOT" \
        --set model.preset="$PRESET" \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set training.num_epochs=120 \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1
fi

eval_one () {  # dir out nsamples extra...  (random + trained-cnn in one pass)
    local dir="$1" out="$2" n="$3"; shift 3
    [ -f "$out" ] && { echo "--- skip $out"; return 0; }
    local exs="random" extra=()
    if [ -f "$CNN" ]; then
        exs="random,classifier"
        extra=(--extractor-checkpoint "classifier=$CNN")
    fi
    run_retry 3600 python -m superdiff_tpu.cli.evaluate --run-dir "$dir" \
        --dataset-root "$SROOT" --num-samples "$n" --batch-size 32 \
        --extractor "$exs" "${extra[@]}" --out "$out" "$@" \
        && { cat "$out"; echo; }
    cp "$out" "$ART/" 2>/dev/null
    return 0
}

echo "========== [3] base student FID vs superposed test =========="
eval_one "$SD" "$SD/eval_super_base_m256.json" 256 \
    --method ddim --num-steps 100

echo "========== [4] progressive distillation 8/4/2/1 =========="
if [ ! -f "$SD/distill/s1/ema_params.npz" ]; then
    run_retry 10800 python -m superdiff_tpu.cli.distill --run-dir "$SD" \
        --dataset-root "$SROOT" --steps 4,2,1 --phase-epochs 60
fi

echo "========== [5] student FID ladder =========="
for N in 4 2 1; do
    SDIR="$SD/distill/s$N"
    [ -d "$SDIR" ] || continue
    eval_one "$SDIR" "$SDIR/eval_super_s${N}_m128.json" 128 \
        --method ddim --num-steps "$N"
done

echo "========== [6] few-step throughput =========="
if [ ! -f "$ART/bench_students.jsonl" ]; then
    for N in 4 1; do
        RUN_DIR="$SD/distill/s$N" STEPS="$N" \
            run_retry 1800 python scripts/bench_r3_distill.py || true
    done > "$ART/bench_students.jsonl" 2>/tmp/r5_super_bench.err
    cat "$ART/bench_students.jsonl"
fi

echo "========== [7] label-distribution semantic check =========="
sample_npy () {  # run_dir outdir extra...
    local dir="$1" outd="$2"; shift 2
    [ -f "$outd/samples.npy" ] && return 0
    run_retry 2400 python -m superdiff_tpu.cli.sample --run-dir "$dir" \
        --batch-size 16 --num-batches 16 --out "$outd" "$@"
}
if [ -f "$CNN" ]; then
    LD="$ART/label_dist"
    mkdir -p "$LD"
    [ -f "$LD/teacher_tree.json" ] || run_retry 1200 \
        python scripts/eval_label_dist.py --classifier "$CNN" \
        --tree "$SROOT/$STASK/test/$STASK" --out "$LD/teacher_tree.json"
    sample_npy "$SD" /tmp/r5_ld_base --method ddim --num-steps 100
    [ -f "$LD/base_student.json" ] || run_retry 1200 \
        python scripts/eval_label_dist.py --classifier "$CNN" \
        --npy /tmp/r5_ld_base/samples.npy --out "$LD/base_student.json"
    sample_npy "$SD/distill/s1" /tmp/r5_ld_s1
    [ -f "$LD/s1_student.json" ] || run_retry 1200 \
        python scripts/eval_label_dist.py --classifier "$CNN" \
        --npy /tmp/r5_ld_s1/samples.npy --out "$LD/s1_student.json"
fi

echo "r5 superdistill campaign done"
