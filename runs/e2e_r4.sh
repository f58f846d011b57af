#!/bin/bash
# Round-4 trained-quality refresh: e2e throughput x quality from the
# aa-typed DiffPhar ckpt (runs/qrun_aa) + round-4 GCPG ckpt (runs/grun_r4),
# then the condition-steering sweep (PARITY part B redo).
# TPU-trained checkpoints => must run on the TPU (orbax cross-platform
# restore fails; CLAUDE.md).
set -e
cd /root/repo
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r4 \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  | tee -a runs/e2e_r4.log
python -u benchmarks/descriptor_drift.py \
  --gcpg-ckpt runs/grun_r4/gcpg_ckpt --n 64 --markdown \
  | tee -a runs/steering_r4.log
