#!/bin/bash
# Round-4 GCPG quality retrain: long-span corpus (sdis 7-13 coverage for
# consensus-hypothesis conditioning) + REAL property conditions (round-4
# fix: the condition head now trains on computed descriptors instead of
# zeros). ~60 min on one v5e. Appends the eval JSON to evals.jsonl.
set -e
cd /root/repo
python -u benchmarks/quality_eval.py \
  --skip-diffphar \
  --workdir runs/grun_r4 \
  --gcpg-corpus 19000 --gcpg-epochs 60 --gcpg-long-frac 0.5 \
  | tee -a runs/grun_r4/train.log | tail -1 >> runs/grun_r4/evals.jsonl
echo "gcpg r4 run done"
