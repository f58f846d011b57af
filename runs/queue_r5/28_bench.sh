#!/bin/bash
# Early-warning headline bench (the driver reruns this at round end):
# confirms the 42k steps/s/chip figure still reproduces after the
# session-restart recovery work.
set -e
cd /root/repo
python bench.py | tee -a runs/bench_r5.log
echo "bench done"
