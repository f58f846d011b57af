#!/bin/bash
# Round-5 GCPG retrain: ionizable long-span corpus (ion-frac 0.35) on top
# of the round-4b wide-complexity mix. Rationale (VERDICT r4 next-1b):
# consensus hypotheses emit POSC/UNKNOWN nodes at sdis 6-13; the r4b
# corpus cannot physically satisfy them (measured corpus-attainable match
# ceiling 0.4-0.67), and validity collapses out-of-distribution (0.86 on
# consensus hypotheses vs 0.977 in-distribution). ion_frac makes those
# hypotheses corpus-attainable (100% feature coverage, span median 7.5).
# ~45 min on one v5e incl. the steering sweep. Snapshot ckpt into git.
set -e
cd /root/repo
mkdir -p runs/grun_r5
python -u benchmarks/quality_eval.py \
  --skip-diffphar \
  --workdir runs/grun_r5 \
  --gcpg-corpus 19000 --gcpg-epochs 60 \
  --gcpg-long-frac 0.4 --gcpg-complexity-frac 0.4 --gcpg-ion-frac 0.35 \
  | tee -a runs/grun_r5/train.log | tail -1 >> runs/grun_r5/evals.jsonl
python - <<'EOF'
import tarfile, pathlib
root = pathlib.Path("runs/grun_r5")
with tarfile.open(root / "gcpg_ckpt.tgz", "w:gz") as tf:
    for p in sorted((root / "gcpg_ckpt").rglob("*")):
        if p.is_file():
            tf.add(p, arcname=str(p.relative_to(root)))
print("snapshot:", (root / "gcpg_ckpt.tgz").stat().st_size, "bytes")
EOF
echo "gcpg r5 ion run done"
