#!/bin/bash
# Round-4 queue, part C: wait for part B (quality segments + e2e refresh)
# to release the TPU, then the wide-complexity GCPG retrain + steering
# sweep (runs/grun_r4b). Probe the tunnel with a tiny matmul before
# starting (CLAUDE.md: one client at a time).
set -x
cd /root/repo
# $1 = PID of the part-B queue shell; wait for it to exit
while [ -e /proc/$1 ]; do sleep 60; done
sleep 30
python - <<'EOF'
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("tunnel probe:", float(np.asarray(x @ x)[0, 0]))
EOF
bash runs/grun_r4b/run.sh
echo TPU_QUEUE_R4C_DONE
