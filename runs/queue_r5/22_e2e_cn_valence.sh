#!/bin/bash
# Valence-aware constrained decoding (structural tables + per-atom bond
# budget state machine, models.gcpg.generate valence=True) on the same
# configuration as stage 21 — the A/B increment over structural-only
# masking. The masks mirror chem.mol's check_valence exactly and are
# property-tested to never block a valid continuation
# (tests/test_gcpg.py valence suite).
set -e
cd /root/repo
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --pockets 8 --cluster-counts 4 5 6 \
  --decode-temperature 0.7 0.85 --validity-gate -1 0.85 \
  --constrain-decode --constrain-valence \
  | tee -a runs/e2e_r5_grid.log
echo "e2e cn valence done"
