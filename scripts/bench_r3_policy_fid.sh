#!/usr/bin/env bash
# Round-3 quality gate for the sampling dtype policy: FID of the trained
# 256² TB runs under bf16-policy sampling (what cli/sample.py now ships)
# vs exact-f32 sampling (SUPERDIFF_TPU_SAMPLE_F32=1), one fixed seeded
# random-projection extractor, identical seeds/batches — so the ONLY
# difference is the sampling dtype policy. The f32 leg doubles as a
# reproduction check against round-2's eval_*_rand.json numbers.
#
# Usage: bash scripts/bench_r3_policy_fid.sh [PRESET ...]
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="data/chest_xray"
OUT="artifacts/quality_256"
PRESETS=("${@:-eff256 attn256}")
[ $# -eq 0 ] && PRESETS=(eff256 attn256)

for P in "${PRESETS[@]}"; do
    RUN_DIR="data/outputs/TB/experiment_q256_run_q_${P}_tb"
    for POLICY in f32 bf16; do
        echo "=== $P / $POLICY sampling ==="
        if [ "$POLICY" = f32 ]; then export SUPERDIFF_TPU_SAMPLE_F32=1
        else unset SUPERDIFF_TPU_SAMPLE_F32 || true; fi
        python -m superdiff_tpu.cli.evaluate --run-dir "$RUN_DIR" \
            --dataset-root "$ROOT" --num-samples 128 --batch-size 32 \
            --method ddim --num-steps 100 --extractor random \
            --out "$OUT/eval_${P}_rand_${POLICY}.json"
        cat "$OUT/eval_${P}_rand_${POLICY}.json"
    done
done
echo "policy FID A/B done"
