#!/bin/bash
# Robust serial TPU queue (round 5; VERDICT r4 item 4).
#
# Round 4's part-E lever never ran because its queue script waited on a
# predecessor PID that outlived the round. This runner is file-driven and
# bounded instead:
#   - stages are executable scripts runs/queue_r5/NN_name.sh, run in
#     lexical order; new stages may be appended while the queue runs
#   - a stage that exits 0 gets NN_name.done; non-zero gets NN_name.fail
#     (the queue continues — later stages must not depend on a failed one)
#   - between stages the runner PROBES the TPU (tiny matmul + host fetch).
#     A hung probe is treated as "wait, the tunnel self-heals" (CLAUDE.md):
#     each probe attempt is bounded at PROBE_TIMEOUT, then the runner
#     sleeps and retries up to PROBE_TRIES times before running the stage
#     anyway (stages are themselves resume-safe).
#   - the runner exits when a stage named NN_stop.sh is consumed or the
#     queue directory has no un-run stages for IDLE_EXIT_S seconds.
#
# Usage: nohup bash runs/queue_runner.sh >> runs/queue_r5/runner.log 2>&1 &
set -u
cd /root/repo
QDIR=runs/queue_r5
mkdir -p "$QDIR"
PROBE_TIMEOUT=${PROBE_TIMEOUT:-1500}
PROBE_TRIES=${PROBE_TRIES:-4}
IDLE_EXIT_S=${IDLE_EXIT_S:-14400}
echo "$$" > "$QDIR/runner.pid"

probe() {
  timeout "$PROBE_TIMEOUT" python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128), jnp.bfloat16)
v = np.asarray(jnp.dot(x, x))
assert float(v[0, 0]) == 128.0
print("probe ok")
EOF
}

wait_for_tpu() {
  for i in $(seq 1 "$PROBE_TRIES"); do
    if probe; then return 0; fi
    echo "[queue] probe attempt $i/$PROBE_TRIES failed/hung; sleeping 300s ($(date -u +%H:%M:%S))"
    sleep 300
  done
  echo "[queue] probes exhausted; proceeding anyway (stages are resume-safe)"
  return 0
}

idle_since=$(date +%s)
while true; do
  next=""
  for f in "$QDIR"/[0-9]*.sh; do
    [ -e "$f" ] || continue
    [ -e "$f.done" ] && continue
    [ -e "$f.fail" ] && continue
    next="$f"; break
  done
  if [ -z "$next" ]; then
    now=$(date +%s)
    if [ $((now - idle_since)) -ge "$IDLE_EXIT_S" ]; then
      echo "[queue] idle ${IDLE_EXIT_S}s; exiting ($(date -u))"
      break
    fi
    sleep 30
    continue
  fi
  idle_since=$(date +%s)
  base=$(basename "$next")
  if [[ "$base" == *stop.sh ]]; then
    touch "$next.done"
    echo "[queue] stop stage consumed; exiting ($(date -u))"
    break
  fi
  echo "[queue] === stage $base start ($(date -u)) ==="
  wait_for_tpu
  if bash "$next" >> "$QDIR/${base%.sh}.log" 2>&1; then
    touch "$next.done"
    echo "[queue] === stage $base DONE ($(date -u)) ==="
  else
    touch "$next.fail"
    echo "[queue] === stage $base FAILED rc=$? ($(date -u)) ==="
  fi
done
