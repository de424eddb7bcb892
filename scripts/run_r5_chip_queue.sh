#!/usr/bin/env bash
# Round-5 chip queue, phase 1 — flagship adjudication (VERDICT r4 #1/#2)
# plus the cheap re-lands (#6-era minsnr row, PNEU flagship companion).
#
#   [1] train the metric-of-record extractor: SmallCNN 3-way
#       NORMAL/TB/PNEUMONIA classifier on the synthetic split ->
#       artifacts/extractors/smallcnn_trained_256.npz  (the reference
#       scores FID on LEARNED features; rounds 2-4 used random-init)
#   [2] wide-deep 120ep quality leg (the width table's missing quality
#       row) + 512-sample evals under all three shared extractors
#   [3] flagship tie-break: wide256 vs wide-slim at 1024 samples under
#       rand + rn18 + trained-cnn
#   [4] trained-cnn 512-sample evals for every width/preset contender
#       (third column of the width + preset tables)
#   [5] trained-cnn re-score of the distillation ladder (does "students
#       ~12x better than teacher" survive a learned feature space?)
#   [6] min_snr re-land (the one BASELINE row with no artifact) — the
#       r4 checkpoint survives, so this is a pure re-eval
#   [7] PNEU wide256 120ep train (flagship companion for superdiff/serve)
#
# Every leg skips when its output exists — safe to re-run after a kill.
# Usage: nohup bash scripts/run_r5_chip_queue.sh > /tmp/r5_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT="data/chest_xray"
CNN="artifacts/extractors/smallcnn_trained_256.npz"
RN18="artifacts/extractors/resnet18_rand_seed1234.npz"
ART="artifacts/quality_256/r5"
mkdir -p "$ART" artifacts/distill_256

TB_WIDE="data/outputs/TB/experiment_q256_run_q_wide256_tb"
TB_WSLIM="data/outputs/TB/experiment_q256_run_q_wideslim_tb"
TB_ATTN="data/outputs/TB/experiment_q256_run_q_attn256d_r3c"
TB_SLIM="data/outputs/TB/experiment_q256_run_q_slim256_tb"
TB_FATTN="data/outputs/TB/experiment_q256_run_q_fastattn256_tb"
TB_MINSNR="data/outputs/TB/experiment_q256_run_q_attn256d_minsnr"

# run_retry SECS cmd...  — the axon backend init hangs forever ~sometimes
# (observed twice this round: process parked on a futex before the first
# program even compiles, while fresh processes connect instantly). A
# bounded timeout + retry converts that failure mode into a few lost
# minutes instead of a lost queue.
run_retry () {
    local secs="$1"; shift
    local try
    for try in 1 2 3 4 5; do
        timeout --kill-after=20 "$secs" "$@" &
        local tpid=$!
        # init-hang detector: a wedged-tunnel process parks on a futex
        # with ~zero CPU forever. Any legitimate leg (tracing, data
        # decode) burns >0.5s of CPU well inside 6 min; if the child has
        # accrued <50 ticks by then it will never recover — kill early
        # instead of burning the full leg timeout.
        (
            sleep 360
            local cpid ticks
            cpid=$(ps --ppid "$tpid" -o pid= | head -1 | tr -d ' ')
            [ -n "$cpid" ] || exit 0
            ticks=$(awk '{print $14 + $15}' "/proc/$cpid/stat" 2>/dev/null)
            if [ -n "$ticks" ] && [ "$ticks" -lt 50 ]; then
                echo "!!! init-hang detected (utime+stime=$ticks), killing $cpid" >&2
                kill "$cpid" 2>/dev/null; sleep 5; kill -9 "$cpid" 2>/dev/null
            fi
        ) &
        local wpid=$!
        wait "$tpid"; local rc=$?
        kill "$wpid" 2>/dev/null
        [ "$rc" -eq 0 ] && return 0
        echo "!!! attempt $try failed (rc=$rc): $*" >&2
        sleep 15
    done
    echo "!!! giving up after 5 attempts: $*" >&2
    return 1
}

# eval_one RUN_DIR OUT EXTRACTOR NSAMP ARTCOPY extra-args...
eval_one () {
    local dir="$1" out="$2" ex="$3" n="$4" artcopy="$5"; shift 5
    [ -f "$out" ] && { echo "--- skip $out"; return 0; }
    local extra=()
    [ "$ex" = resnet18 ] && extra=(--extractor-checkpoint "$RN18")
    [ "$ex" = classifier ] && extra=(--extractor-checkpoint "$CNN")
    echo "=== eval $out ($ex, n=$n) ==="
    run_retry 2400 \
        python -m superdiff_tpu.cli.evaluate --run-dir "$dir" \
        --dataset-root "$ROOT" --num-samples "$n" --batch-size 32 \
        --extractor "$ex" "${extra[@]}" --out "$out" "$@" \
        && { cat "$out"; echo; }
    [ -n "$artcopy" ] && cp "$out" "$artcopy" 2>/dev/null
    return 0
}

echo "========== [1] trained extractor =========="
if [ ! -f "$CNN" ]; then
    run_retry 3000 python scripts/train_extractor.py \
        --dataset-root "$ROOT" --out "$CNN"
fi
[ -f "$CNN" ] || { echo "FATAL: extractor training failed"; exit 1; }

echo "========== [2] wide-deep quality leg =========="
WD="data/outputs/TB/experiment_q256_run_q_widedeep_tb"
if [ ! -f "$WD/config.yaml" ]; then
    run_retry 7200 python -m superdiff_tpu.cli.train --dataset TB \
        --experiment-id q256 --run-id q_widedeep_tb \
        --dataset-root "$ROOT" \
        --set model.preset=wide256 \
        --set model.num_res_blocks=2,2,2,2,2 \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set training.num_epochs=120 \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1
fi
eval_one "$WD" "$WD/eval_rand512.json" random 512 \
    "$ART/q_widedeep_tb_rand512.json" --method ddim --num-steps 100
eval_one "$WD" "$WD/eval_rn18_512.json" resnet18 512 \
    "$ART/q_widedeep_tb_rn18_512.json" --method ddim --num-steps 100
eval_one "$WD" "$WD/eval_cnn512.json" classifier 512 \
    "$ART/q_widedeep_tb_cnn512.json" --method ddim --num-steps 100

echo "========== [3] flagship tie-break at 1024 =========="
for spec in "$TB_WIDE:q_wide256_tb" "$TB_WSLIM:q_wideslim_tb"; do
    dir="${spec%%:*}"; name="${spec##*:}"
    for ex in random resnet18 classifier; do
        tag=rand; [ "$ex" = resnet18 ] && tag=rn18
        [ "$ex" = classifier ] && tag=cnn
        eval_one "$dir" "$dir/eval_${tag}1024.json" "$ex" 1024 \
            "$ART/${name}_${tag}1024.json" --method ddim --num-steps 100
    done
done

echo "========== [4] trained-cnn 512 evals (third column) =========="
for spec in "$TB_WIDE:q_wide256_tb" "$TB_WSLIM:q_wideslim_tb" \
            "$TB_ATTN:q_attn256d_r3c" "$TB_SLIM:q_slim256_tb" \
            "$TB_FATTN:q_fastattn256_tb"; do
    dir="${spec%%:*}"; name="${spec##*:}"
    eval_one "$dir" "$dir/eval_cnn512.json" classifier 512 \
        "$ART/${name}_cnn512.json" --method ddim --num-steps 100
done

echo "========== [5] distill ladder, trained-cnn re-score =========="
eval_one "$TB_ATTN" "$TB_ATTN/eval_cnn_teacher_ddim100.json" classifier 128 \
    "artifacts/distill_256/eval_cnn_teacher_ddim100.json" \
    --method ddim --num-steps 100
for N in 8 4 2 1; do
    eval_one "$TB_ATTN" "$TB_ATTN/eval_cnn_teacher_ddim${N}_trailing.json" \
        classifier 128 \
        "artifacts/distill_256/eval_cnn_teacher_ddim${N}_trailing.json" \
        --method ddim --num-steps "$N" --spacing trailing
    SDIR="$TB_ATTN/distill/s$N"
    [ -d "$SDIR" ] && eval_one "$SDIR" "$SDIR/eval_cnn_ddim$N.json" \
        classifier 128 "artifacts/distill_256/eval_cnn_s$N.json" \
        --method ddim --num-steps "$N"
done
eval_one "$TB_ATTN" "$TB_ATTN/eval_cnn_dpmpp10.json" classifier 128 \
    "artifacts/distill_256/eval_cnn_dpmpp10.json" \
    --method dpmpp --num-steps 10

echo "========== [6] min_snr re-land =========="
eval_one "$TB_MINSNR" "$TB_MINSNR/eval_rand128_r5.json" random 128 \
    "$ART/q_attn256d_minsnr_rand128.json" --method ddim --num-steps 100
eval_one "$TB_MINSNR" "$TB_MINSNR/eval_cnn128.json" classifier 128 \
    "$ART/q_attn256d_minsnr_cnn128.json" --method ddim --num-steps 100

echo "========== [7] PNEU wide256 companion =========="
PW="data/outputs/PNEUMONIA/experiment_q256_run_q_wide256_pneu"
if [ ! -f "$PW/config.yaml" ]; then
    run_retry 7200 python -m superdiff_tpu.cli.train --dataset PNEUMONIA \
        --experiment-id q256 --run-id q_wide256_pneu \
        --dataset-root "$ROOT" \
        --set model.preset=wide256 \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set training.num_epochs=120 \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1
fi
eval_one "$PW" "$PW/eval_rand128.json" random 128 \
    "$ART/q_wide256_pneu_rand128.json" --method ddim --num-steps 100
eval_one "$PW" "$PW/eval_cnn128.json" classifier 128 \
    "$ART/q_wide256_pneu_cnn128.json" --method ddim --num-steps 100

echo "r5 queue phase 1 done"
