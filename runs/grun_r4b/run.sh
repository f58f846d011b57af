#!/bin/bash
# Round-4b GCPG retrain: wide-complexity corpus (half simple chains, half
# bridged polycyclics at complexity-frac 0.5, long-frac 0.4 kept for the
# consensus sdis range) so the SAS condition — flat in the round-4 part-B
# sweep because the base grammar clusters at SAS 4.5 +- 0.5 — has support
# to learn from (corpus now: SAS p5-p95 ~3.0-6.1, MW 139-431, logP
# -0.7..5.8). Then the steering sweep on the new checkpoint.
# ~30 min on one v5e. Run AFTER the main round-4 queue drains.
set -e
cd /root/repo
python -u benchmarks/quality_eval.py \
  --skip-diffphar \
  --workdir runs/grun_r4b \
  --gcpg-corpus 19000 --gcpg-epochs 60 \
  --gcpg-long-frac 0.4 --gcpg-complexity-frac 0.5 \
  | tee -a runs/grun_r4b/train.log | tail -1 >> runs/grun_r4b/evals.jsonl
python -u benchmarks/descriptor_drift.py \
  --gcpg-ckpt runs/grun_r4b/gcpg_ckpt --n 64 --markdown \
  | tee -a runs/steering_r4b.log
echo "gcpg r4b run done"
