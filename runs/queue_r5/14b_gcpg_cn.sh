#!/bin/bash
# Round-5 validity lever: retrain the ion-corpus GCPG with consensus-style
# graph randomization (consensus_noise 0.5) — the measured validity gap is
# a train/serve graph-distribution gap (0.95 in-dist vs 0.80-0.82 on
# consensus hypotheses in runs/e2e_r5_grid.log rows A/B). ~50 min.
set -e
cd /root/repo
mkdir -p runs/grun_r5cn
python -u benchmarks/quality_eval.py \
  --skip-diffphar \
  --workdir runs/grun_r5cn \
  --gcpg-corpus 19000 --gcpg-epochs 60 \
  --gcpg-long-frac 0.4 --gcpg-complexity-frac 0.4 --gcpg-ion-frac 0.35 \
  --gcpg-consensus-noise 0.5 \
  | tee -a runs/grun_r5cn/train.log | tail -1 >> runs/grun_r5cn/evals.jsonl
echo "gcpg r5cn run done"
