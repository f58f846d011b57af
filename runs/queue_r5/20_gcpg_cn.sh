#!/bin/bash
# Session-restart recovery: the grun_r5cn GCPG checkpoint (untracked) was
# wiped with the restart; retrain it identically to stage 14b (consensus
# noise 0.5 on the ion long-span mix) and THIS time snapshot the ckpt
# into a committable tgz. ~30-50 min (host corpus prep + ~18 min TPU).
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
python - <<'EOF'
import tarfile, pathlib
root = pathlib.Path("runs/grun_r5cn")
with tarfile.open(root / "gcpg_ckpt.tgz", "w:gz") as tf:
    for p in sorted((root / "gcpg_ckpt").rglob("*")):
        if p.is_file():
            tf.add(p, arcname=str(p.relative_to(root)))
print("snapshot:", (root / "gcpg_ckpt.tgz").stat().st_size, "bytes")
EOF
echo "gcpg r5cn rerun done"
