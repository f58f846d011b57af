#!/bin/bash
# Triple-target confirmation at 2x pocket count: stage 22 hit all three
# targets at once on 8 pockets (valence-constrained decode, temp 0.7:
# no gate 2003/min / 0.9035 / 0.3175; gate 0.85 1998/min / 0.9074 /
# 0.340). Confirm the headline on 16 pockets / 48 hypotheses so the
# claim is not an artifact of one pocket draw.
set -e
cd /root/repo
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r5cn \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  --pockets 16 --cluster-counts 4 5 6 \
  --decode-temperature 0.7 --validity-gate 0.85 \
  --constrain-decode --constrain-valence \
  | tee -a runs/e2e_r5_grid.log
echo "e2e confirm16 done"
