#!/usr/bin/env bash
# Round-5 master orchestrator: chains the chip phases back-to-back so the
# chip never idles. Every sub-script is idempotent (skips existing
# outputs), so re-running this after any failure resumes where it died.
#
#   phase 1  run_r5_chip_queue.sh   (extractor + flagship adjudication)
#   phase 1b run_r5_chip_queue.sh   (second pass: fills classifier-FID
#            evals that phase 1 skipped while the extractor was being
#            retrained with the fixed recipe)
#   phase 2  run_r5_superdistill.sh (superposition -> few-step students;
#            runs the CPU weak-scaling sweep CONCURRENTLY during the
#            chip-bound tree build — the one window where the host core
#            is otherwise idle)
#   phase 3  run_r5_ledger.sh       (flagship ledger re-base + serving npy)
#   phase 4  run_r5_stretch.sh      (S=4096-attention flagship variant)
#
# Usage: nohup bash scripts/run_r5_master.sh > /tmp/r5_master.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

stamp () { echo "===== [$(date +%H:%M:%S)] $*"; }

stamp "phase 1: chip queue (adjudication)"
bash scripts/run_r5_chip_queue2.sh >> /tmp/r5_queue2.log 2>&1
stamp "phase 1b: chip queue second pass (stragglers)"
bash scripts/run_r5_chip_queue2.sh >> /tmp/r5_queue2.log 2>&1

stamp "phase 2: superdiff distillation (+ scaling sweep on the idle core)"
if [ ! -s artifacts/scaling/bench.jsonl ]; then
    ( nice -n 10 python scripts/bench_r4_scaling.py \
        > /tmp/r5_scaling.jsonl 2>/tmp/r5_scaling.log \
      && mkdir -p artifacts/scaling \
      && cp /tmp/r5_scaling.jsonl artifacts/scaling/bench.jsonl ) &
    SCALING_PID=$!
fi
bash scripts/run_r5_superdistill.sh > /tmp/r5_super.log 2>&1
[ -n "${SCALING_PID:-}" ] && wait "$SCALING_PID" 2>/dev/null

stamp "phase 3: ledger re-base + serving"
bash scripts/run_r5_ledger.sh > /tmp/r5_ledger.log 2>&1

stamp "phase 4: stretch (wide-attn64)"
bash scripts/run_r5_stretch.sh > /tmp/r5_stretch.log 2>&1

stamp "master done"
