#!/usr/bin/env bash
# Run a command on every worker of a Cloud TPU pod slice — the multi-host
# analogue of the reference's `srun` line (src/slurm/submit_experiment.slurm:15).
#
# On a pod, each host must start the same program; jax.distributed.initialize
# (enabled via SUPERDIFF_TPU_MULTIHOST=1, see parallel/mesh.py) wires the
# hosts together and the (data, model) mesh spans all chips.
#
# Usage:
#   scripts/tpu_pod_run.sh TPU_NAME ZONE -- python -m superdiff_tpu.cli.train ...
set -euo pipefail

TPU_NAME=${1:?tpu name}; ZONE=${2:?zone}
shift 2
[[ "${1:-}" == "--" ]] && shift

# Quote each argument for the remote shell so spaces/quotes survive; the
# repo must be checked out on every worker at $REMOTE_DIR (default: same
# directory name under the worker home as locally).
REMOTE_DIR=${REMOTE_DIR:-$(basename "$(pwd)")}
CMD=$(printf '%q ' "$@")

gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" \
  --worker=all \
  --command "cd $(printf '%q' "$REMOTE_DIR") && SUPERDIFF_TPU_MULTIHOST=1 IS_CLUSTER=1 $CMD"
