#!/bin/bash
# Condition-steering re-verification on the round-5 consensus-noise GCPG
# (the r4b sweep proved all four swept conditions monotone; re-check that
# the ion corpus + graph randomization kept the condition head live).
set -e
cd /root/repo
python -u benchmarks/descriptor_drift.py \
  --gcpg-ckpt runs/grun_r5cn/gcpg_ckpt --n 64 --markdown \
  | tee -a runs/steering_r5.log
echo "steering sweep done"
