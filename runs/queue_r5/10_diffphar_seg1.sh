#!/bin/bash
# Round-5 stage: retrain the aa-typed DiffPhar quality model, segment 1
# (the round-4 checkpoints did not survive the round transition — only
# git-tracked files persist; CLAUDE.md's "runs/ survives" note is wrong
# for round boundaries and artifacts we need later must be committed).
set -e
cd /root/repo
bash runs/qrun_aa/run_segment.sh 1
