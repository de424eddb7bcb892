#!/usr/bin/env bash
# Visualization job launcher — capability of the reference's
# run_visualizations.sh + submit_master_visualizer.slurm (fixed flag set,
# experiment-scoped output dirs). Runs on host CPU so it can sit next to a
# TPU training job without stealing the chip.
#
# Usage: scripts/launch_visualize.sh RUN_DIR [DATASET_ROOT]
set -euo pipefail

RUN_DIR=${1:?run dir}
DATASET_ROOT=${2:-}

cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export SUPERDIFF_TPU_PLATFORM=${SUPERDIFF_TPU_PLATFORM:-cpu}

ARGS=(--run-dir "$RUN_DIR" --trajectory --forward-strip --tsne)
if [[ -n "$DATASET_ROOT" ]]; then
  ARGS+=(--dataset-root "$DATASET_ROOT" --real-vs-generated)
fi
exec python -m superdiff_tpu.cli.visualize "${ARGS[@]}"
