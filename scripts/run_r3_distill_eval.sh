#!/usr/bin/env bash
# Round-3 progressive-distillation quality ladder on the trained flagship.
#
# For each student sN under RUN_DIR/distill, evaluates FID at its target
# step count (trailing DDIM, stamped by the distill CLI), and evaluates the
# UNDISTILLED teacher at the same step count / spacing as the honest
# baseline distillation must beat. Same protocol as the other round-3
# quality tables: 128 samples, shared fixed random-projection extractor.
#
# Usage: RUN_DIR=data/outputs/TB/experiment_q256_run_q_attn256d_r3b \
#            bash scripts/run_r3_distill_eval.sh
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_DIR="${RUN_DIR:?set RUN_DIR to the teacher run dir}"
ROOT="${ROOT:-data/chest_xray}"
N_EVAL="${N_EVAL:-128}"
STEPS="${STEPS:-8 4 2 1}"

eval_one () {  # run_dir out_json steps extra...
    local dir="$1" out="$2" steps="$3"; shift 3
    echo "=== evaluate $out (ddim-$steps) ==="
    python -m superdiff_tpu.cli.evaluate --run-dir "$dir" \
        --dataset-root "$ROOT" --num-samples "$N_EVAL" --batch-size 32 \
        --method ddim --num-steps "$steps" \
        --extractor random \
        --out "$out" "$@"
    cat "$out"; echo
}

for N in $STEPS; do
    SDIR="$RUN_DIR/distill/s$N"
    [ -d "$SDIR" ] || { echo "skip s$N (no $SDIR)"; continue; }
    eval_one "$SDIR" "$SDIR/eval_ddim$N.json" "$N"
    eval_one "$RUN_DIR" "$RUN_DIR/eval_teacher_ddim${N}_trailing.json" \
        "$N" --spacing trailing
done
echo "distill FID ladder done"
