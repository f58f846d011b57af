#!/bin/bash
# Round-4 capacity experiment (launch manually once the T=500 A/B
# verdict is in): hidden 192 x 4 blocks — ~3x the per-step compute of the
# h128x3 runs — at the winning chain length. Everything else matches
# runs/qrun_aa / runs/qrun_t500 (aa-typed corpus, 3k complexes, bs 64,
# K=16, EMA 0.999, stratified-t, resident-data).
# Usage: bash runs/qrun_cap/run_segment.sh <segment-index 1..N> <T>
set -e
SEG=${1:?segment index}
T=${2:?training chain length (100 or 500)}
EPOCHS=$((SEG * 3600))
cd /root/repo
python -u benchmarks/quality_eval.py \
  --skip-gcpg \
  --workdir runs/qrun_cap \
  --diffphar-aa-typed \
  --diffphar-timesteps $T \
  --diffphar-complexes 3000 \
  --diffphar-epochs $EPOCHS \
  --diffphar-hidden 192 --diffphar-layers 4 \
  --diffphar-batch 64 --diffphar-lr 3e-4 \
  --diffphar-neighbor-k 16 \
  --diffphar-steps-per-call 50 \
  --diffphar-ckpt-epochs 200 \
  --diffphar-ema 0.999 --diffphar-stratified-t \
  --diffphar-val-epochs 200 \
  --diffphar-resume \
  | tee -a runs/qrun_cap/segment_${SEG}.log \
  | grep -E '^\{|# diffphar done' | tail -1 \
  | sed "s/^# diffphar done: //" >> runs/qrun_cap/evals.jsonl
echo "segment $SEG done (epochs <= $EPOCHS, T=$T)"
