#!/bin/bash
# THE unmeasured round-5 lever: syntax-constrained SMILES decoding
# (commit f07a94b) on the 14c/15 winning configuration. Round-5 frontier
# without it: 2,315/min / 0.755 / 0.324 (no gate) and 1,406/min / 0.857 /
# 0.331 (gate 0.85) — validity is the only missing triple-target leg and
# the invalid modes are dominated by exactly the structural errors the
# constraint masks. Grid: temp {0.7, 0.85} x gate {off, 0.85}; 0.85 temp
# included because the constraint removes the syntax tail that cooling
# was compensating for (uniq_rate paid for it).
set -e
cd /root/repo
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --pockets 8 --cluster-counts 4 5 6 \
  --decode-temperature 0.7 0.85 --validity-gate -1 0.85 \
  --constrain-decode \
  | tee -a runs/e2e_r5_grid.log
echo "e2e cn constrained done"
