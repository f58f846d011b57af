#!/bin/bash
# Round-4 unattended TPU queue (run AFTER runs/grun_r4/run.sh completes;
# one tunnel client at a time — CLAUDE.md). Each stage appends to its own
# log; re-runnable, stages are individually resume-safe.
set -x
cd /root/repo

# 1. bench probe: att-gate mul-reduce fusion + shared entry gather
python bench.py | tee -a runs/bench_r4_attfuse.log

# 2. early e2e + steering sweep from the segment-1 diffphar ckpt (180k
#    steps) + the fresh round-4 GCPG ckpt — an early match-score read in
#    case later stages run out of wall clock.
bash runs/e2e_r4.sh

# 3. quality segments 2-4 (+3600 epochs each, ~45 min each), spread curve
#    lands in runs/qrun_aa/evals.jsonl one line per segment.
bash runs/qrun_aa/run_segment.sh 2
bash runs/qrun_aa/run_segment.sh 3
bash runs/qrun_aa/run_segment.sh 4

# 4. e2e + steering refresh from the final ckpt.
bash runs/e2e_r4.sh

echo TPU_QUEUE_R4_DONE
