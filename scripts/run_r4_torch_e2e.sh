#!/usr/bin/env bash
# Trained-reference-checkpoint migration, end to end (VERDICT r3 #6).
#
# Trains the reference architecture in PyTorch-CPU on the synthetic tree
# (its exact graph/recipe/artifact naming — scripts/train_torch_oracle.py),
# then drives the migration chain on the TRAINED weights:
#     import_torch -> sample -> evaluate (FID) -> superpose (Itô logq)
# All on the CPU backend (nice'd) so a concurrent TPU campaign is
# undisturbed. Artifacts land in artifacts/torch_import_e2e/.
#
# Usage: nohup bash scripts/run_r4_torch_e2e.sh > /tmp/r4_torch_e2e.log 2>&1 &
set -euo pipefail
cd "$(dirname "$0")/.."

export SUPERDIFF_TPU_PLATFORM=cpu
ROOT="data/chest_xray_64"
RES=64
STEPS="${STEPS:-400}"
ORACLE="data/torch_oracle"
ART="artifacts/torch_import_e2e"

[ -d "$ROOT/TB/train" ] || \
    python scripts/make_synthetic_dataset.py --root "$ROOT" --resolution "$RES"

for TASK in TB PNEUMONIA; do
    if [ ! -f "$ORACLE/$TASK/ema_epoch1.pt" ]; then
        echo "=== train torch oracle $TASK ($STEPS steps) ==="
        nice -n 19 python scripts/train_torch_oracle.py --root "$ROOT" \
            --task "$TASK" --resolution "$RES" --steps "$STEPS" \
            --out "$ORACLE/$TASK"
    fi
    IMP="data/outputs/$TASK/imported_oracle"
    if [ ! -f "$IMP/config.yaml" ]; then
        echo "=== import $TASK ==="
        python -m superdiff_tpu.cli.import_torch \
            --checkpoint "$ORACLE/$TASK/ema_epoch1.pt" \
            --out "$IMP" --resolution "$RES" --normalization tanh \
            --task "$TASK"
    fi
done

TB_IMP="data/outputs/TB/imported_oracle"
PN_IMP="data/outputs/PNEUMONIA/imported_oracle"
mkdir -p "$ART"

echo "=== sample (trained imported weights, DDIM-50) ==="
nice -n 19 python -m superdiff_tpu.cli.sample --run-dir "$TB_IMP" \
    --method ddim --num-steps 50 --batch-size 8 --num-batches 1 \
    --out "$TB_IMP/samples"

echo "=== evaluate FID (trained imported weights) ==="
nice -n 19 python -m superdiff_tpu.cli.evaluate --run-dir "$TB_IMP" \
    --dataset-root "$ROOT" --num-samples 32 --batch-size 8 \
    --method ddim --num-steps 50 --extractor random \
    --out "$TB_IMP/eval_imported.json"
cat "$TB_IMP/eval_imported.json"; echo

echo "=== superpose the two trained imports (Itô logq) ==="
nice -n 19 python -m superdiff_tpu.cli.evaluate --run-dir "$TB_IMP" \
    --run-dir2 "$PN_IMP" \
    --dataset-root "$ROOT" --num-samples 8 --batch-size 8 \
    --method ddim --num-steps 50 --extractor random \
    --out "$TB_IMP/eval_superposed.json"
cat "$TB_IMP/eval_superposed.json"; echo

cp "$TB_IMP/eval_imported.json" "$ART/eval_imported_tb.json"
cp "$TB_IMP/eval_superposed.json" "$ART/eval_superposed.json"
cp "$TB_IMP/samples/batch0.png" "$ART/samples_tb.png" 2>/dev/null || true
echo "torch-import e2e done -> $ART"
