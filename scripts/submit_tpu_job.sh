#!/usr/bin/env bash
# Queue a training job on a Cloud TPU slice — the TPU-native analogue of the
# reference's scheduler submission layer (src/scripts/jobs/submit_experiment.sh:
# arg validation -> partition autoselect over biggpu/bigbatch/stampede via
# sinfo -> log dirs -> sbatch --export). Here the "scheduler" is the Cloud TPU
# queued-resources API and the "partition" is the accelerator type: we probe a
# preference list of slice shapes for quota/availability and submit against
# the first that accepts, then hand off to scripts/tpu_pod_run.sh (the srun
# analogue) once the slice is ACTIVE.
#
# Usage:
#   scripts/submit_tpu_job.sh --experiment E --run R --dataset TB \
#       [--task TB] [--zone us-central1-a] [--project P] \
#       [--accelerators "v5litepod-8 v5litepod-4 v4-8"] [--dry-run]
#
# --dry-run prints the exact command plan without calling gcloud (used by
# tests/test_eval_profiling.py::test_submit_tpu_job_dry_run; also works on
# machines without gcloud).
set -euo pipefail
cd "$(dirname "$0")/.."

EXPERIMENT="" RUN="" DATASET="" TASK="" DRY=0
ZONE="${ZONE:-us-central1-a}"
PROJECT="${PROJECT:-}"
ACCELERATORS="${ACCELERATORS:-v5litepod-8 v5litepod-4 v4-8}"
RUNTIME_VERSION="${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}"
EXTRA=()
while [[ "$#" -gt 0 ]]; do
    case $1 in
        --experiment) EXPERIMENT="$2"; shift ;;
        --run) RUN="$2"; shift ;;
        --dataset) DATASET="$2"; shift ;;
        --task) TASK="$2"; shift ;;
        --zone) ZONE="$2"; shift ;;
        --project) PROJECT="$2"; shift ;;
        --accelerators) ACCELERATORS="$2"; shift ;;
        --runtime-version) RUNTIME_VERSION="$2"; shift ;;
        --dry-run) DRY=1 ;;
        --) shift; EXTRA=("$@"); break ;;
        *) echo "unknown parameter: $1" >&2; exit 1 ;;
    esac
    shift
done

if [[ -z "$EXPERIMENT" || -z "$RUN" || -z "$DATASET" ]]; then
    echo "usage: $0 --experiment E --run R --dataset TB|PNEUMONIA [--task T]" >&2
    exit 1
fi
case "$DATASET" in TB|PNEUMONIA) ;; *)
    echo "error: --dataset must be TB or PNEUMONIA" >&2; exit 1 ;;
esac
TASK="${TASK:-$DATASET}"

TPU_NAME="superdiff-e${EXPERIMENT}-r${RUN}"
LOG_DIR="data/outputs/logs/experiment_${EXPERIMENT}/run_${RUN}"
PFLAG=()
[[ -n "$PROJECT" ]] && PFLAG=(--project "$PROJECT")

# Accelerator autoselect: first type in the preference list whose submission
# the API accepts (quota/capacity errors fall through to the next type) —
# same first-fit policy as the reference's choose_partition(). The command
# is built as a bash array and executed directly (not word-split from a
# string), so --project / names containing spaces or glob chars stay intact.
build_submit_cmd() {
    SUBMIT_CMD=(gcloud compute tpus queued-resources create "$TPU_NAME"
        "${PFLAG[@]+"${PFLAG[@]}"}"
        --zone "$ZONE"
        --accelerator-type "$1"
        --runtime-version "$RUNTIME_VERSION"
        --node-id "$TPU_NAME"
        --best-effort)
}

TRAIN_CMD=(scripts/launch_train.sh -e "$EXPERIMENT" -r "$RUN" -d "$DATASET")
[[ ${#EXTRA[@]} -gt 0 ]] && TRAIN_CMD+=(-- "${EXTRA[@]}")

if [[ "$DRY" == 1 ]]; then
    echo "[dry-run] log dir: $LOG_DIR"
    for ACC in $ACCELERATORS; do
        build_submit_cmd "$ACC"
        echo "[dry-run] try: ${SUBMIT_CMD[*]}"
    done
    echo "[dry-run] wait: gcloud compute tpus queued-resources describe $TPU_NAME --zone $ZONE (until ACTIVE)"
    echo "[dry-run] run:  scripts/tpu_pod_run.sh $TPU_NAME $ZONE -- ${TRAIN_CMD[*]}"
    exit 0
fi

command -v gcloud >/dev/null || { echo "error: gcloud not installed" >&2; exit 1; }
mkdir -p "$LOG_DIR"

ACCEPTED=""
for ACC in $ACCELERATORS; do
    echo "trying accelerator type $ACC ..."
    build_submit_cmd "$ACC"
    if "${SUBMIT_CMD[@]}" >"$LOG_DIR/submit.log" 2>&1; then
        ACCEPTED="$ACC"; break
    fi
    cat "$LOG_DIR/submit.log" >&2
done
[[ -n "$ACCEPTED" ]] || { echo "error: no accelerator type accepted the job" >&2; exit 1; }
echo "queued $TPU_NAME ($ACCEPTED); waiting for ACTIVE ..."

# Tolerate transient describe failures: the resource is already queued, so
# one API blip must not abort the (potentially hours-long) wait and leak it.
while true; do
    if STATE=$(gcloud compute tpus queued-resources describe "$TPU_NAME" \
        "${PFLAG[@]+"${PFLAG[@]}"}" --zone "$ZONE" \
        --format='value(state.state)'); then
        echo "  state: $STATE"
        case "$STATE" in
            ACTIVE) break ;;
            FAILED|SUSPENDED)
                echo "error: queued resource $STATE" >&2; exit 1 ;;
        esac
    else
        echo "  describe failed (transient?); retrying" >&2
    fi
    sleep 30
done

exec scripts/tpu_pod_run.sh "$TPU_NAME" "$ZONE" -- "${TRAIN_CMD[@]}" \
    > "$LOG_DIR/output.log" 2> "$LOG_DIR/error.log"
