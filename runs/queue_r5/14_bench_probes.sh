#!/bin/bash
# Round-5 perf probes (VERDICT r4 next-3): the headline bench for
# reference, then the MEASURED floor (copy bandwidth + binding-constraint
# scaling of the real step) and the N_pad bucket lever.
set -e
cd /root/repo
python bench.py | tee -a runs/bench_r5.log
python -u benchmarks/hbm_floor.py | tee -a runs/bench_r5.log
python -u benchmarks/bench_buckets.py | tee -a runs/bench_r5.log
echo "bench probes done"
