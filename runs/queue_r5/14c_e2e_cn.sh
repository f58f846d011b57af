#!/bin/bash
# e2e rows with the consensus-noise GCPG (runs/grun_r5cn). Grid lessons:
# ancestral t0.7 = match king (0.318), DDIM0 t0.7 = validity king
# (0.8625); align tuning is NOT the lever (13b: conformers 2 LOST aligned
# count, align is not the steady-state bottleneck); keep-top ranking too
# slow to pay. The 3-pocket walls are startup/drain-dominated (per-pocket
# stage busys: sample ~19 s, decode ~24 s at 3 cluster counts) — 8
# pockets runs the overlapped pipeline at steady state.
set -e
cd /root/repo
LOG=runs/e2e_r5_grid.log
# comparability row (stage-13 row-A settings, cn model)
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 | tee -a $LOG
# triple-target candidate: 8 pockets x 3 cluster counts, ancestral
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 --pockets 8 --cluster-counts 4 5 6 | tee -a $LOG
# validity-leaning candidate: DDIM0 at the same settings
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --ddim-eta 0 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 --pockets 8 --cluster-counts 4 5 6 | tee -a $LOG
echo "e2e cn rows done"
