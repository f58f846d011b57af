#!/bin/bash
# Round-4 queue, part D: wait for part C (wide-complexity GCPG retrain +
# steering sweep) to release the TPU, then — cheapest-decisive-first:
#   1. DDIM eta sweep on the trained qrun_aa checkpoint (eval-only,
#      ~5 min each): does the deterministic corner close the unclamped
#      spread gap that 755k ancestral training steps did not?
#   2. capstone e2e (aa-typed DiffPhar x wide-complexity GCPG) in three
#      sampler variants: ancestral+clamp8 (round-4 comparable), DDIM0
#      unclamped (the principled path), DDIM0+clamp8 (best-of-both).
#   3. the T=500 DiffPhar spread experiment (runs/qrun_t500).
# Usage: nohup bash runs/tpu_queue_r4d.sh <part-C shell PID> &
set -x
cd /root/repo
while [ -e /proc/$1 ]; do sleep 60; done
sleep 30
python - <<'EOF'
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("tunnel probe:", float(np.asarray(x @ x)[0, 0]))
EOF
for ETA in 0.0 0.3 1.0; do
  python -u benchmarks/quality_eval.py \
    --skip-gcpg --workdir runs/qrun_aa --eval-only \
    --eval-ddim-eta $ETA \
    | tail -1 | sed "s/^/{\"eval_ddim_eta\": $ETA} /" \
    >> runs/qrun_aa/ddim_sweep.jsonl
done
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r4b \
  --neighbor-k 16 --clamp-x 8 --smiles-per-hypothesis 2048 \
  | tee -a runs/e2e_r4_final.log
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r4b \
  --neighbor-k 16 --ddim-eta 0 --smiles-per-hypothesis 2048 \
  | tee -a runs/e2e_r4_final.log
python -u benchmarks/e2e_trained.py \
  --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r4b \
  --neighbor-k 16 --ddim-eta 0 --clamp-x 8 --smiles-per-hypothesis 2048 \
  | tee -a runs/e2e_r4_final.log
bash runs/qrun_t500/run_segment.sh 1
bash runs/qrun_t500/run_segment.sh 2
echo TPU_QUEUE_R4D_DONE
