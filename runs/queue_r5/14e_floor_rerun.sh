#!/bin/bash
# Corrected floor probe re-run: the first run's "bandwidth" timed the
# axon tunnel fetch of the whole array (16 GB/s = network); this run
# ships 16 bytes. Plus K=16 linearity check and a B=24 point.
set -e
cd /root/repo
python -u benchmarks/hbm_floor.py | tee -a runs/bench_r5.log
echo "floor rerun done"
