#!/bin/bash
# Round-5 e2e triple-target grid (VERDICT r4 next-1): the ion-corpus GCPG
# (runs/grun_r5) x the retrained aa-typed DiffPhar (runs/qrun_aa), probing
# for ONE row with >=1k aligned/min AND validity >=0.9 AND match >=0.3.
# Rows (cheapest-decisive ordering):
#   A ancestral+clamp8 temp0.7   — r4 throughput king (959/min) + the
#     measured validity/match levers (temp 0.7: match 0.335 on DDIM0)
#   B ancestral+clamp8 temp0.85  — validity/diversity middle point
#   C DDIM0+clamp8   temp0.7     — r4 best-match config, now w/ ion GCPG
#   D row-A config + 4 cluster counts + keep-top-match 0.6 — selection row
#     (kept_mols_per_min includes ranking time; both match means reported)
set -e
cd /root/repo
LOG=runs/e2e_r5_grid.log
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 | tee -a $LOG
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.85 | tee -a $LOG
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --ddim-eta 0 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 | tee -a $LOG
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 --cluster-counts 4 5 6 7 \
  --keep-top-match-frac 0.6 | tee -a $LOG
echo "e2e r5 grid done"
