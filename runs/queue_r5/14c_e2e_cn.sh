#!/bin/bash
# e2e rows with the consensus-noise GCPG (runs/grun_r5cn): the grid's
# lessons — ancestral t0.7 is the match king (0.318), DDIM0 t0.7 the
# validity king (0.8625), keep-top ranking is too slow to pay (216 s for
# 1604 mols). Final-config candidates add steady-state amortization
# (6 pockets) + the align-tuned settings.
set -e
cd /root/repo
LOG=runs/e2e_r5_grid.log
# comparability row (same settings as stage-13b row 1, cn model)
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 \
  --n-conformers 2 --refine-steps 50 --align-chunk 128 | tee -a $LOG
# triple-target candidate: 6 pockets, 3 cluster counts, align-tuned
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 --pockets 6 --cluster-counts 4 5 6 \
  --n-conformers 2 --refine-steps 50 --align-chunk 128 | tee -a $LOG
# validity-leaning candidate: DDIM0 at the same settings
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --ddim-eta 0 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --decode-temperature 0.7 --pockets 6 --cluster-counts 4 5 6 \
  --n-conformers 2 --refine-steps 50 --align-chunk 128 | tee -a $LOG
echo "e2e cn rows done"
