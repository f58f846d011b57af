#!/bin/bash
# Round-4 queue, part D: wait for part C (wide-complexity GCPG retrain +
# steering sweep) to release the TPU, then the T=500 DiffPhar spread
# experiment (runs/qrun_t500). Probe the tunnel before starting.
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
bash runs/qrun_t500/run_segment.sh 1
bash runs/qrun_t500/run_segment.sh 2
echo TPU_QUEUE_R4D_DONE
