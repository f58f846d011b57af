#!/bin/bash
# Round-4 queue, part B: remaining quality segments + final e2e refresh.
# (Part A — bench probe, early e2e, steering sweep, segment 1 — completed
# 2026-08-19 morning; segment 2 died with the session at 12:16.)
set -x
cd /root/repo
bash runs/qrun_aa/run_segment.sh 2
bash runs/qrun_aa/run_segment.sh 3
bash runs/qrun_aa/run_segment.sh 4
bash runs/e2e_r4.sh
echo TPU_QUEUE_R4B_DONE
