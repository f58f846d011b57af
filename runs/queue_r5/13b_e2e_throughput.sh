#!/bin/bash
# Round-5 e2e throughput rows: the ion-corpus GCPG quadrupled the matched
# rate (warmup: 584/2720 vs ~3% in round 4), which moved the bottleneck to
# the align stage (74 of 120 busy-seconds). Validity and match are
# SMILES-level metrics, so cutting conformers 5->2 and refine 100->50
# buys align speed without touching the triple-target legs.
set -e
cd /root/repo
LOG=runs/e2e_r5_grid.log
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 \
  --n-conformers 2 --refine-steps 50 --align-chunk 128 | tee -a $LOG
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 --cluster-counts 4 5 6 7 \
  --n-conformers 2 --refine-steps 50 --align-chunk 128 | tee -a $LOG
echo "e2e r5 throughput rows done"
