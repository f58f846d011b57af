#!/bin/bash
# Segment 2 (302k steps total) — round 4's best downstream-match DiffPhar
# checkpoint was the 302k-step segment (spread minimum 68.2 A; PERF.md).
set -e
cd /root/repo
bash runs/qrun_aa/run_segment.sh 2
# snapshot the checkpoint into git so the round's e2e rows stay
# reproducible even if bulk artifacts are wiped again
python - <<'EOF'
import tarfile, pathlib
root = pathlib.Path("runs/qrun_aa")
with tarfile.open(root / "ckpt_302k.tgz", "w:gz") as tf:
    for p in sorted((root / "ckpt").glob("last*")):
        tf.add(p, arcname=p.name)
print("snapshot:", (root / "ckpt_302k.tgz").stat().st_size, "bytes")
EOF
