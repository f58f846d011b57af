#!/bin/bash
# One training segment (+3600 epochs ≈ 151k steps ≈ 45 min on one v5e) of
# the round-4 aa-typed DiffPhar quality run, then the reference eval suite.
# Usage: bash runs/qrun_aa/run_segment.sh <segment-index 1..4>
# Resume-safe: re-running a segment resumes from workdir/ckpt 'last' and
# skips covered epochs. Appends one JSON line per eval to evals.jsonl.
set -e
SEG=${1:?segment index}
EPOCHS=$((SEG * 3600))
cd /root/repo
python -u benchmarks/quality_eval.py \
  --skip-gcpg \
  --workdir runs/qrun_aa \
  --diffphar-aa-typed \
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
  | tee -a runs/qrun_aa/segment_${SEG}.log \
  | grep -E '^\{|# diffphar done' | tail -1 \
  | sed "s/^# diffphar done: //" >> runs/qrun_aa/evals.jsonl
echo "segment $SEG done (epochs <= $EPOCHS)"
