#!/usr/bin/env bash
# Round-5 chip queue, phase 1 (v2) — same adjudication plan as
# run_r5_chip_queue.sh, but every FID leg scores ALL shared extractors
# (random + rn18-rand + trained-cnn) in ONE cli.evaluate process: the
# remote compile of a sampler measured 10-20 min per fresh process today,
# so one sampling pass per (run, N) instead of three cuts the queue ~3x.
# Bonus: the random/rn18 columns of each multi-eval reproduce the r3/r4
# artifacts bit-for-bit (same seed -> same samples), a free
# reproducibility pin alongside the new classifier column.
#
# Idempotent: skips when the multi-eval output exists.
# Usage: nohup bash scripts/run_r5_chip_queue2.sh > /tmp/r5_queue2.log 2>&1 &
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
WD="data/outputs/TB/experiment_q256_run_q_widedeep_tb"

run_retry () {
    local secs="$1"; shift
    local try
    for try in 1 2 3 4 5; do
        timeout --kill-after=20 "$secs" "$@" &
        local tpid=$!
        (
            sleep 360
            local cpid ticks
            cpid=$(ps --ppid "$tpid" -o pid= | head -1 | tr -d ' ')
            [ -n "$cpid" ] || exit 0
            ticks=$(awk '{print $14 + $15}' "/proc/$cpid/stat" 2>/dev/null)
            if [ -n "$ticks" ] && [ "$ticks" -lt 50 ]; then
                echo "!!! init-hang (utime+stime=$ticks), killing $cpid" >&2
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

# meval RUN_DIR OUT NSAMP ARTCOPY extra-args...   (all three extractors)
meval () {
    local dir="$1" out="$2" n="$3" artcopy="$4"; shift 4
    [ -f "$out" ] && { echo "--- skip $out"; return 0; }
    echo "=== meval $out (n=$n) ==="
    run_retry 3600 \
        python -m superdiff_tpu.cli.evaluate --run-dir "$dir" \
        --dataset-root "$ROOT" --num-samples "$n" --batch-size 32 \
        --extractor random,resnet18,classifier \
        --extractor-checkpoint "resnet18=$RN18,classifier=$CNN" \
        --out "$out" "$@" \
        && { cat "$out"; echo; }
    [ -n "$artcopy" ] && [ -f "$out" ] && cp "$out" "$artcopy"
    return 0
}

echo "========== [1] trained extractor =========="
if [ ! -f "$CNN" ]; then
    run_retry 3000 python scripts/train_extractor.py \
        --dataset-root "$ROOT" --out "$CNN"
fi
[ -f "$CNN" ] || { echo "FATAL: extractor training failed"; exit 1; }

echo "========== [2] wide-deep multi-eval =========="
meval "$WD" "$WD/eval_m512.json" 512 \
    "$ART/q_widedeep_tb_m512.json" --method ddim --num-steps 100

echo "========== [3] flagship tie-break at 1024 =========="
meval "$TB_WIDE" "$TB_WIDE/eval_m1024.json" 1024 \
    "$ART/q_wide256_tb_m1024.json" --method ddim --num-steps 100
meval "$TB_WSLIM" "$TB_WSLIM/eval_m1024.json" 1024 \
    "$ART/q_wideslim_tb_m1024.json" --method ddim --num-steps 100

echo "========== [4] preset table third column (512) =========="
for spec in "$TB_WIDE:q_wide256_tb" "$TB_WSLIM:q_wideslim_tb" \
            "$TB_ATTN:q_attn256d_r3c" "$TB_SLIM:q_slim256_tb" \
            "$TB_FATTN:q_fastattn256_tb"; do
    dir="${spec%%:*}"; name="${spec##*:}"
    meval "$dir" "$dir/eval_m512.json" 512 \
        "$ART/${name}_m512.json" --method ddim --num-steps 100
done

echo "========== [5] distill ladder multi re-score =========="
meval "$TB_ATTN" "$TB_ATTN/eval_m_teacher_ddim100.json" 128 \
    "artifacts/distill_256/eval_m_teacher_ddim100.json" \
    --method ddim --num-steps 100
for N in 8 4 2 1; do
    meval "$TB_ATTN" "$TB_ATTN/eval_m_teacher_ddim${N}_trailing.json" 128 \
        "artifacts/distill_256/eval_m_teacher_ddim${N}_trailing.json" \
        --method ddim --num-steps "$N" --spacing trailing
    SDIR="$TB_ATTN/distill/s$N"
    [ -d "$SDIR" ] && meval "$SDIR" "$SDIR/eval_m_ddim$N.json" 128 \
        "artifacts/distill_256/eval_m_s$N.json" \
        --method ddim --num-steps "$N"
done
meval "$TB_ATTN" "$TB_ATTN/eval_m_dpmpp10.json" 128 \
    "artifacts/distill_256/eval_m_dpmpp10.json" \
    --method dpmpp --num-steps 10

echo "========== [6] min_snr re-land =========="
meval "$TB_MINSNR" "$TB_MINSNR/eval_m128.json" 128 \
    "$ART/q_attn256d_minsnr_m128.json" --method ddim --num-steps 100

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
meval "$PW" "$PW/eval_m128.json" 128 \
    "$ART/q_wide256_pneu_m128.json" --method ddim --num-steps 100

echo "r5 queue2 phase 1 done"
