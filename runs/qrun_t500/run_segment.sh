#!/bin/bash
# Round-4 spread experiment: identical config to runs/qrun_aa (aa-typed,
# 3k complexes, hidden 128 x 3 blocks, bs 64, K=16, EMA, stratified-t)
# EXCEPT the training chain length T=500 (qrun_aa trains T=100).
# Rationale (PERF.md round-3/4 quality): spread plateaued at ~4.5x data
# after 585k steps at T=100; per-step reverse amplification ~1/alpha_ts
# shrinks with T at identical per-step training cost, and the reference
# trains T=500. This is the controlled A/B for that lever.
# Usage: bash runs/qrun_t500/run_segment.sh <segment-index 1..N>
set -e
SEG=${1:?segment index}
EPOCHS=$((SEG * 3600))
cd /root/repo
python -u benchmarks/quality_eval.py \
  --skip-gcpg \
  --workdir runs/qrun_t500 \
  --diffphar-aa-typed \
  --diffphar-timesteps 500 \
  --diffphar-complexes 3000 \
  --diffphar-epochs $EPOCHS \
  --diffphar-hidden 128 --diffphar-layers 3 \
  --diffphar-batch 64 --diffphar-lr 3e-4 \
  --diffphar-neighbor-k 16 \
  --diffphar-steps-per-call 50 \
  --diffphar-ckpt-epochs 200 \
  --diffphar-ema 0.999 --diffphar-stratified-t \
  --diffphar-val-epochs 200 \
  --diffphar-resume \
  | tee -a runs/qrun_t500/segment_${SEG}.log \
  | grep -E '^\{|# diffphar done' | tail -1 \
  | sed "s/^# diffphar done: //" >> runs/qrun_t500/evals.jsonl
echo "segment $SEG done (epochs <= $EPOCHS)"
