#!/bin/bash
# Round-5 spread lever (VERDICT r4 next-2): the capacity experiment —
# hidden 192 x 4 blocks at T=100 (T=500 measured no better: qrun_t500
# summary.json, 86-93 A). Scripted in round 4, never launched. One
# segment = 3600 epochs ~= 180k steps at ~3x h128x3 per-step compute.
# The eval suite appends unclamped spread_gen to runs/qrun_cap/evals.jsonl.
set -e
cd /root/repo
bash runs/qrun_cap/run_segment.sh 1 100
python - <<'EOF'
import tarfile, pathlib
root = pathlib.Path("runs/qrun_cap")
with tarfile.open(root / "ckpt_seg1.tgz", "w:gz") as tf:
    for p in sorted((root / "ckpt").glob("last*")):
        tf.add(p, arcname=p.name)
print("snapshot:", (root / "ckpt_seg1.tgz").stat().st_size, "bytes")
EOF
echo "cap seg1 done"
