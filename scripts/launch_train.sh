#!/usr/bin/env bash
# TPU training launcher — the TPU-native equivalent of the reference's
# SLURM submission layer (src/scripts/run_experiment.sh +
# src/slurm/submit_experiment.slurm, which submit a single-GPU job).
#
# Responsibilities:
#   - arg validation (experiment/run/dataset), like submit_experiment.sh
#   - environment marking (IS_CLUSTER) for path resolution
#   - preemption resilience: auto-restart with --resume on non-zero exit
#     (the reference loses all in-flight state on its 48 h wall kill;
#     here Orbax checkpoints + restart-loop give elastic recovery)
#
# Usage:
#   scripts/launch_train.sh -e EXP -r RUN -d TB|PNEUMONIA [-c CONFIG] \
#       [-- extra --set overrides...]
set -euo pipefail

EXPERIMENT="" RUN="" DATASET="" CONFIG="" MAX_RESTARTS=10
while getopts "e:r:d:c:m:" opt; do
  case $opt in
    e) EXPERIMENT=$OPTARG ;;
    r) RUN=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    m) MAX_RESTARTS=$OPTARG ;;
    *) echo "usage: $0 -e EXP -r RUN -d DATASET [-c CONFIG] [-m MAX_RESTARTS] [-- extra args]" >&2
       exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[[ "${1:-}" == "--" ]] && shift

if [[ -z "$EXPERIMENT" || -z "$RUN" || -z "$DATASET" ]]; then
  echo "error: -e EXPERIMENT, -r RUN and -d DATASET are required" >&2
  exit 2
fi
case "$DATASET" in TB|PNEUMONIA) ;; *)
  echo "error: -d must be TB or PNEUMONIA" >&2; exit 2 ;;
esac

cd "$(dirname "$0")/.."
export IS_CLUSTER=${IS_CLUSTER:-1}
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

ARGS=(--experiment-id "$EXPERIMENT" --run-id "$RUN" --dataset "$DATASET")
[[ -n "$CONFIG" ]] && ARGS+=(--config "$CONFIG")

attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "[launch_train] attempt $attempt: python -m superdiff_tpu.cli.train ${ARGS[*]} $*"
  code=0
  python -m superdiff_tpu.cli.train "${ARGS[@]}" "$@" || code=$?
  if (( code == 0 )); then
    echo "[launch_train] training completed"
    exit 0
  fi
  if (( attempt >= MAX_RESTARTS )); then
    echo "[launch_train] giving up after $attempt attempts (exit $code)" >&2
    exit "$code"
  fi
  echo "[launch_train] exited $code — restarting with --resume in 10s" >&2
  sleep 10
done
