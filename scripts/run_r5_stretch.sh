#!/usr/bin/env bash
# Round-5 stretch (VERDICT r4 #8): put long-seq attention in a product
# path. Trains the flagship with attention ALSO at the 64-per-side level
# (S=4096 — the Pallas-bwd 2x regime; at production batch the XLA path's
# materialized score matrices are prohibitive) under the 120ep quality
# protocol, then reports FID (all three shared extractors) + DDPM-1000
# throughput — either a quality win only the flash bwd makes affordable,
# or a measured close-out of SURVEY §5.7's open question.
#
# Usage: nohup bash scripts/run_r5_stretch.sh > /tmp/r5_stretch.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

ROOT="data/chest_xray"
CNN="artifacts/extractors/smallcnn_trained_256.npz"
RN18="artifacts/extractors/resnet18_rand_seed1234.npz"
ART="artifacts/quality_256/r5"
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

WA="data/outputs/TB/experiment_q256_run_q_wideattn64_tb"
if [ ! -f "$WA/config.yaml" ]; then
    run_retry 10800 python -m superdiff_tpu.cli.train --dataset TB \
        --experiment-id q256 --run-id q_wideattn64_tb \
        --dataset-root "$ROOT" \
        --set model.preset=wide256 \
        --set model.attn_resolutions=64,32,16 \
        --set training.resolution=256 \
        --set training.batch_size=32 \
        --set training.num_epochs=120 \
        --set training.lr_schedule=cosine \
        --set training.warmup_steps=100 \
        --set training.vis_every=60 \
        --set training.save_every=60 \
        --set training.keep_checkpoints=1
fi

OUT="$WA/eval_q_wideattn64_tb_m512.json"
if [ ! -f "$OUT" ]; then
    run_retry 3600 python -m superdiff_tpu.cli.evaluate --run-dir "$WA" \
        --dataset-root "$ROOT" --num-samples 512 --batch-size 32 \
        --method ddim --num-steps 100 \
        --extractor random,resnet18,classifier \
        --extractor-checkpoint "resnet18=$RN18,classifier=$CNN" \
        --out "$OUT" && { cat "$OUT"; echo; }
    cp "$OUT" "$ART/" 2>/dev/null || true
fi

if [ ! -s "$ART/bench_wideattn64.jsonl" ]; then
    ONLY="wide256,wide-attn64" run_retry 3600 \
        python scripts/bench_r4_width.py \
        > "$ART/bench_wideattn64.jsonl" 2>/tmp/r5_stretch_bench.log
    cat "$ART/bench_wideattn64.jsonl"
fi
echo "r5 stretch done"
