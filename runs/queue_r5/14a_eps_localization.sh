#!/bin/bash
# Spread-error localization probes on the retrained qrun_aa checkpoint
# (VERDICT r4 next-2 diagnosis arm): per-t eps error split + reverse
# spread trajectory vs forward marginals. Unclamped (the production
# clamp hides the divergence being measured).
set -e
cd /root/repo
python -u benchmarks/eps_localization.py \
  --diff-workdir runs/qrun_aa --neighbor-k 16 \
  | tee -a runs/eps_localization_r5.log
echo "eps localization done"
