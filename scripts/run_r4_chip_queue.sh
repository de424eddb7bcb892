#!/usr/bin/env bash
# Round-4 chip agenda, run AFTER scripts/run_r3_distill_campaign.sh.
# Sequential (one chip, one host core), resumable: every stage is skipped
# when its artifact already exists, so a tunnel outage costs one stage,
# not the queue. Covers VERDICT r3 items #2 (width), #3 (serving),
# #4 (512-sample rescore + re-landed quality artifacts), #5 (long-seq
# on-chip), plus the PNEU/superdiff-256 replication (r3 artifacts were in
# the wiped data/ tree).
#
# Usage: nohup bash scripts/run_r4_chip_queue.sh > /tmp/r4_queue.log 2>&1 &
set -uo pipefail          # no -e: a failed stage should not kill the queue
cd "$(dirname "$0")/.."

ROOT="data/chest_xray"
TEACH="data/outputs/TB/experiment_q256_run_q_attn256d_r3c"
EPOCHS="${EPOCHS:-120}"

train_preset () {  # task run_id preset [extra --set args...]
    local task="$1" run="$2" preset="$3"; shift 3
    local dir="data/outputs/$task/experiment_q256_run_$run"
    if [ -f "$dir/config.yaml" ] && [ -d "$dir/checkpoints" ]; then
        echo "--- skip train $run (exists)"; return 0
    fi
    echo "=== train $task $preset -> $run ==="
    python -m superdiff_tpu.cli.train --dataset "$task" \
        --experiment-id q256 --run-id "$run" \
        --dataset-root "$ROOT" \
        --set "model.preset=$preset" \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set "training.num_epochs=$EPOCHS" \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1 "$@"
}

eval_shared () {  # run_dir out_name num_samples [extra args...]
    local dir="$1" out="$2" n="$3"; shift 3
    if [ -f "$dir/$out" ]; then echo "--- skip eval $out (exists)"; return 0; fi
    python -m superdiff_tpu.cli.evaluate --run-dir "$dir" \
        --dataset-root "$ROOT" --num-samples "$n" --batch-size 32 \
        --method ddim --num-steps 100 --extractor random \
        --out "$dir/$out" "$@" && { cat "$dir/$out"; echo; }
}

RN18="artifacts/extractors/resnet18_rand_seed1234.npz"

eval_rn18 () {  # run_dir out_name steps num_samples [extra args...]
    local dir="$1" out="$2" steps="$3" n="${4:-128}"; shift 4 || shift 3
    if [ -f "$dir/$out" ]; then echo "--- skip eval $out (exists)"; return 0; fi
    python -m superdiff_tpu.cli.evaluate --run-dir "$dir" \
        --dataset-root "$ROOT" --num-samples "$n" --batch-size 32 \
        --method ddim --num-steps "$steps" \
        --extractor resnet18 --extractor-checkpoint "$RN18" \
        --out "$dir/$out" "$@" && { cat "$dir/$out"; echo; }
}

echo "========== [A0] conv-feature FID cross-check of the distill ladder =========="
# The linear random-projection FID scored the distilled students 0.15 vs
# the teacher's 6.58 — it reads pixel-moment closeness and is blind to the
# detail the teacher adds. Re-score the ladder under the seeded random-init
# ResNet18 (hierarchical conv features; artifacts/extractors/).
mkdir -p artifacts/distill_256
if [ -d "$TEACH" ]; then
    eval_rn18 "$TEACH" eval_teacher_rn18_ddim100.json 100 128
    cp "$TEACH/eval_teacher_rn18_ddim100.json" artifacts/distill_256/ 2>/dev/null
    for N in 8 4 2 1; do
        SDIR="$TEACH/distill/s$N"
        [ -d "$SDIR" ] || continue
        eval_rn18 "$SDIR" "eval_rn18_ddim$N.json" "$N" 128
        eval_rn18 "$TEACH" "eval_teacher_rn18_ddim${N}_trailing.json" "$N" 128 \
            --spacing trailing
        cp "$SDIR/eval_rn18_ddim$N.json" \
           "artifacts/distill_256/eval_rn18_s$N.json" 2>/dev/null
        cp "$TEACH/eval_teacher_rn18_ddim${N}_trailing.json" \
           artifacts/distill_256/ 2>/dev/null
    done
fi

echo "========== [A] width-at-128^2 throughput A/B =========="
mkdir -p artifacts/width_256
if [ ! -s artifacts/width_256/bench.jsonl ]; then
    python scripts/bench_r4_width.py > /tmp/r4_width.jsonl \
        2>/tmp/r4_width.log && cp /tmp/r4_width.jsonl \
        artifacts/width_256/bench.jsonl
    tail -4 artifacts/width_256/bench.jsonl || true
fi

echo "========== [B] quality trains: wide256 slim256 fastattn256 =========="
train_preset TB q_wide256_tb wide256
train_preset TB q_slim256_tb slim256
train_preset TB q_fastattn256_tb fastattn256

echo "========== [C] 512-sample shared-extractor rescore =========="
mkdir -p artifacts/quality_256/r4_512
for pair in "q_attn256d_r3c:$TEACH" \
            "q_wide256_tb:data/outputs/TB/experiment_q256_run_q_wide256_tb" \
            "q_slim256_tb:data/outputs/TB/experiment_q256_run_q_slim256_tb" \
            "q_fastattn256_tb:data/outputs/TB/experiment_q256_run_q_fastattn256_tb"; do
    run="${pair%%:*}"; dir="${pair#*:}"
    [ -d "$dir" ] || { echo "--- no $dir, skip"; continue; }
    eval_shared "$dir" eval_rand128.json 128
    eval_shared "$dir" eval_rand512.json 512
    eval_rn18  "$dir" eval_rn18_512.json 100 512
    cp "$dir/eval_rand128.json" "artifacts/quality_256/r4_512/${run}_128.json" 2>/dev/null
    cp "$dir/eval_rand512.json" "artifacts/quality_256/r4_512/${run}_512.json" 2>/dev/null
    cp "$dir/eval_rn18_512.json" "artifacts/quality_256/r4_512/${run}_rn18_512.json" 2>/dev/null
done

echo "========== [D] PNEU companion + superdiff-256 =========="
train_preset PNEUMONIA q_attn256d_pneu attn256d
PNEU="data/outputs/PNEUMONIA/experiment_q256_run_q_attn256d_pneu"
if [ -d "$PNEU" ]; then
    eval_shared "$PNEU" eval_rand128.json 128
    cp "$PNEU/eval_rand128.json" \
       artifacts/quality_256/r4_512/q_attn256d_pneu_128.json 2>/dev/null
    # superposed log-densities + FID in one eval (evaluate --run-dir2)
    eval_shared "$TEACH" eval_superdiff256.json 128 --run-dir2 "$PNEU"
    for mode in or and; do
        if [ ! -f "$TEACH/superposed256_$mode/logq.json" ]; then
            python -m superdiff_tpu.cli.sample --run-dir "$TEACH" \
                --run-dir2 "$PNEU" --mode "$mode" --batch-size 16 \
                --num-batches 2 --seed 7 \
                --out "$TEACH/superposed256_$mode"
        fi
    done
    python -m superdiff_tpu.cli.visualize --run-dir "$TEACH" \
        --run-dir2 "$PNEU" --compare --out "$TEACH/compare256" || true
    mkdir -p artifacts/quality_256/superdiff_256
    cp "$TEACH/eval_superdiff256.json" \
       artifacts/quality_256/superdiff_256/ 2>/dev/null
    for mode in or and; do
        cp "$TEACH/superposed256_$mode/logq.json" \
           "artifacts/quality_256/superdiff_256/logq_$mode.json" 2>/dev/null
    done
fi

echo "========== [E] guidance knob evals on the teacher =========="
for g in 1.5 2.0 3.0; do
    eval_shared "$TEACH" "eval_g${g/./}.json" 128 --guidance "$g"
    cp "$TEACH/eval_g${g/./}.json" \
       "artifacts/quality_256/r4_512/teacher_g${g/./}.json" 2>/dev/null
done

echo "========== [F] serving ledger =========="
mkdir -p artifacts/serve_256
if [ ! -s artifacts/serve_256/bench.jsonl ] && [ -d "$TEACH" ]; then
    RUN_DIR="$TEACH" RUN_DIR2="${PNEU:-}" \
        python scripts/bench_r4_serve.py > /tmp/r4_serve.jsonl \
        2>/tmp/r4_serve.log && cp /tmp/r4_serve.jsonl \
        artifacts/serve_256/bench.jsonl
    tail -8 artifacts/serve_256/bench.jsonl || true
fi

echo "========== [H-optional] min-SNR knob replication =========="
# round-3 claimed min_snr FID 6.903 (worse than uniform) from an artifact
# the wiped data/ tree took with it; re-land the measured claim.
if [ "${SKIP_MINSNR:-0}" != "1" ]; then
    train_preset TB q_attn256d_minsnr attn256d \
        --set training.loss_weighting=min_snr
    MS="data/outputs/TB/experiment_q256_run_q_attn256d_minsnr"
    if [ -d "$MS" ]; then
        eval_shared "$MS" eval_rand128.json 128
        cp "$MS/eval_rand128.json" \
           artifacts/quality_256/r4_512/minsnr_128.json 2>/dev/null
    fi
fi

echo "========== [G] long-sequence flash on-chip =========="
mkdir -p artifacts/longseq
if [ ! -s artifacts/longseq/bench.jsonl ]; then
    python scripts/bench_r4_longseq.py > /tmp/r4_longseq.jsonl \
        2>/tmp/r4_longseq.log && cp /tmp/r4_longseq.jsonl \
        artifacts/longseq/bench.jsonl
    cat artifacts/longseq/bench.jsonl || true
fi

echo "r4 chip queue done"
