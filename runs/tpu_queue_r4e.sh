#!/bin/bash
# Round-4 queue, part E: wait for part D (capstone e2e + qrun_t500
# segments 1-2) to release the TPU, then measure the decode-temperature
# validity lever on the winning sampler variant from part D
# (DDIM0+clamp8: match_aligned 0.324 but validity 0.808):
#   temperature 0.85 and 0.7 A/B vs the part-D temperature-1.0 rows.
# Usage: nohup bash runs/tpu_queue_r4e.sh <part-D shell PID> &
set -x
cd /root/repo
while [ -e /proc/$1 ]; do sleep 60; done
sleep 30
# wait-tolerant tunnel probe (CLAUDE.md: a hung probe self-heals in
# ~10-15 min after the previous client exits; treat hang as wait)
timeout 1500 python - <<'PYEOF'
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("tunnel probe:", float(np.asarray(x @ x)[0, 0]))
PYEOF
for TEMP in 0.85 0.7; do
  python -u benchmarks/e2e_trained.py \
    --diff-workdir runs/qrun_aa --gcpg-workdir runs/grun_r4b \
    --neighbor-k 16 --ddim-eta 0 --clamp-x 8 \
    --smiles-per-hypothesis 2048 --decode-temperature $TEMP \
    | tee -a runs/e2e_r4_temp.log
done
echo TPU_QUEUE_R4E_DONE
