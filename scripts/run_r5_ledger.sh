#!/usr/bin/env bash
# Round-5 phase 2 — re-base the measured ledger on the settled flagship
# (VERDICT r4 #3) and close the serving gap (#5).
#
#   [1] wide256 training throughput + norm-policy A/B + grad agreement
#       (the BASELINE training table had no wide256 row at all)
#   [2] fused-pipeline img/s on the flagship preset (4-epoch real
#       cli.train run, the r3 measurement re-pointed at wide256)
#   [3] serving ledger at the flagship pair: png (all specs, conc
#       1/4/8/16 to bracket the r4 superdiff conc-16 dip) + npy
#       (dpmpp-10 — the spec the r4 run showed host-PNG-bound at 51/s
#       vs 128.5 offline)
#
# Usage: nohup bash scripts/run_r5_ledger.sh > /tmp/r5_ledger.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

ART="artifacts/ledger_r5"
mkdir -p "$ART"
TB_WIDE="data/outputs/TB/experiment_q256_run_q_wide256_tb"
PNEU_WIDE="data/outputs/PNEUMONIA/experiment_q256_run_q_wide256_pneu"

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

echo "========== [1] wide256 train throughput + norm A/B =========="
if [ ! -s "$ART/train_wide256.jsonl" ]; then
    PRESETS="wide256:32" GRAD_PRESET="wide256" \
        run_retry 3600 python scripts/bench_r3_train.py \
        > "$ART/train_wide256.jsonl" 2>/tmp/r5_train_bench.log
    cat "$ART/train_wide256.jsonl"
fi

echo "========== [2] fused-pipeline img/s (wide256) =========="
PIPE="data/outputs/TB/experiment_r5pipe_run_wide256"
if [ ! -f "$ART/pipeline_wide256.txt" ]; then
    rm -rf "$PIPE"
    run_retry 3600 python -m superdiff_tpu.cli.train --dataset TB \
        --experiment-id r5pipe --run-id wide256 \
        --dataset-root data/chest_xray \
        --set model.preset=wide256 \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set training.num_epochs=4 \
        --set training.vis_every=0 \
        --set training.save_every=0 \
        2>&1 | tee /tmp/r5_pipe.log | grep "img/s" \
        > "$ART/pipeline_wide256.txt"
    cat "$ART/pipeline_wide256.txt"
fi

echo "========== [3] serving ledger at the flagship pair =========="
RUN2=()
[ -d "$PNEU_WIDE/checkpoints" ] && RUN2=(RUN_DIR2="$PNEU_WIDE")
if [ ! -s "$ART/serve_png.jsonl" ]; then
    env RUN_DIR="$TB_WIDE" "${RUN2[@]}" \
    CONCURRENCIES="1,4,8,16" FORMAT=png SPECS="dpmpp-10" \
        timeout --kill-after=20 7200 python scripts/bench_r4_serve.py \
        > "$ART/serve_png.jsonl" 2>/tmp/r5_serve_png.log
    cat "$ART/serve_png.jsonl"
fi
if [ ! -s "$ART/serve_npy.jsonl" ]; then
    RUN_DIR="$TB_WIDE" \
    CONCURRENCIES="1,4,16" FORMAT=npy SPECS="dpmpp-10" \
        run_retry 3600 python scripts/bench_r4_serve.py \
        > "$ART/serve_npy.jsonl" 2>/tmp/r5_serve_npy.log
    cat "$ART/serve_npy.jsonl"
fi

echo "r5 ledger phase done"
