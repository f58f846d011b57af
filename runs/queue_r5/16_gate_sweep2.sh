#!/bin/bash
# Stage 15 verdict: temperature is SATURATED below 0.7 (validity 0.755
# -> 0.757 at 0.6; uniq_rate pays 0.77 -> 0.67) — the gate is the lever.
# gate 0.85 @ t0.7 = 0.857 validity / 1406/min / 0.331 match (24 hyps,
# kept 6). Missing leg is hypothesis SUPPLY above 0.9: double the pocket
# count so the gate has a deeper tail to select from, and A/B the ion
# GCPG (grun_r5 — higher OOD validity distribution, match_aligned 0.318
# in stage 13) against the cn model at the same settings.
set -e
cd /root/repo
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --pockets 16 --cluster-counts 4 5 6 \
  --decode-temperature 0.7 --validity-gate -1 0.87 \
  | tee -a runs/e2e_r5_grid.log
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --pockets 16 --cluster-counts 4 5 6 \
  --decode-temperature 0.7 --validity-gate 0.87 \
  | tee -a runs/e2e_r5_grid.log
echo "gate sweep 2 done"
