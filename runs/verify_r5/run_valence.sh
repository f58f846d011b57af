#!/bin/bash
# CPU-forced end-to-end verify, round-5 session 2: the standard recipe
# with the NEW constrained-decode surface exercised through the CLI —
# generate and run-all with --constrain-decode/--constrain-valence.
set -x
export JAX_PLATFORM_NAME=cpu
V=runs/verify_r5; IN=$V/in
python runs/verify_r5/mkinputs.py $IN || exit 1
python -m cmdgen_tpu.cli preprocess $IN/pairs.tsv $V/DATA || exit 2
python -m cmdgen_tpu.cli train-diffphar $V/DATA $V/CKPT --max-steps 3 --epochs 2 --batch-size 4 --neighbor-k 12 || exit 3
python -m cmdgen_tpu.cli sample-phars $V/CKPT $IN/pocket_0.pdb $V/cloud.json --ref-ligand A:101 --n-samples 24 --timesteps 20 --neighbor-k 12 || exit 4
python -m cmdgen_tpu.cli get-phar $V/cloud.json $V/hyp.posp --n-clusters 4 || exit 5
python -m cmdgen_tpu.cli train-gcpg $IN/smiles.txt $V/GCKPT --epochs 2 --batch-size 8 --max-steps 4 || exit 6
python -m cmdgen_tpu.cli generate $V/hyp.posp $V/OUT $V/GCKPT --n 16 --no-filter --constrain-decode --constrain-valence || exit 7
python -m cmdgen_tpu.cli align $IN/smiles.txt $V/hyp.posp $V/ALIGNED --tolerance 2 || exit 8
python -m cmdgen_tpu.cli run-all $V/CKPT $V/GCKPT $V/RUNALL $IN/pocket_0.pdb --ref-ligand A:101 --n-clouds 4 --timesteps 4 --cluster-counts 3 --smiles-per-hypothesis 16 --n-conformers 2 --neighbor-k 0 --constrain-decode --constrain-valence || exit 9
echo VERIFY_VALENCE_OK
