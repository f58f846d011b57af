#!/bin/bash
# Validity-leg sweep on the 14c winner (consensus-noise GCPG, ancestral,
# clamp8, 8 pockets x cc{4,5,6}): decode temperature {0.7, 0.6} crossed
# with the per-hypothesis validity gate {off, 0.85, 0.9}. One process —
# warmup compiles shared, ~4 min per measured row. 14c rows at t0.7/no
# gate: 2315-2327 aligned/min, match_aligned 0.32-0.33, validity
# 0.74-0.76 — validity is the only missing triple-target leg.
set -e
cd /root/repo
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --pockets 8 --cluster-counts 4 5 6 \
  --decode-temperature 0.7 0.6 --validity-gate -1 0.85 0.9 \
  | tee -a runs/e2e_r5_grid.log
echo "gate sweep done"
