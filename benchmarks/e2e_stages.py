"""End-to-end pipeline stage throughput (the ≥1k aligned molecules/min
north star, BASELINE.json).

Measures the machinery throughput of each stage with flagship-size models
(weights untrained — chemistry quality is a training question; throughput is
not). Prints one JSON line per stage plus a pipeline estimate assuming the
stages run concurrently (TPU sampling/decoding overlaps host chemistry via
process pools, SURVEY.md §7 hard part 5).

Run: python benchmarks/e2e_stages.py [--quick]
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import random
import sys
import time

# NOTE: do not use PYTHONPATH for this — setting PYTHONPATH at all breaks
# the axon TPU plugin registration in this image; inject the repo root here
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main(quick: bool = False):
    from cmdgen_tpu.chem.match import get_match_scores
    from cmdgen_tpu.chem.mol import canonical_smiles
    from cmdgen_tpu.chem.ppgraph import smiles_to_ppgraph
    from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs
    from cmdgen_tpu.config import GCPGModelConfig, ca_config
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
    from cmdgen_tpu.models import gcpg as gcpg_mod
    from cmdgen_tpu.models.dynamics import EGNNDynamics
    from cmdgen_tpu.models.gcpg import GCPG
    from cmdgen_tpu.ops.dgeom import embed_conformers
    from cmdgen_tpu.pipeline.align import align_batch

    results = {}

    # ---- stage 1: diffusion sampling (hypotheses/min)
    cfg = ca_config()
    egnn = dataclasses.replace(cfg.dynamics.egnn, compute_dtype=jnp.bfloat16)
    dyn_cfg = dataclasses.replace(cfg.dynamics, egnn=egnn)
    dynamics = EGNNDynamics(dyn_cfg)
    model = ConditionalDDPM(cfg.ddpm, dynamics)
    b, n_p, n_q = 32 if quick else 64, 8, 110
    T = 50 if quick else 500
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    pocket = PointCloud(
        x=jax.random.uniform(k1, (b, n_q, 3)) * 25.0,
        h=jax.nn.one_hot(jax.random.randint(k2, (b, n_q), 0, 20), 20),
        mask=jnp.ones((b, n_q)),
    )
    params = dynamics.init(
        k3, jnp.zeros((b, n_p, 11)), pocket.xh, jnp.zeros((b, 1)),
        jnp.ones((b, n_p)), pocket.mask,
    )
    sample = jax.jit(
        lambda p, r: model.sample_given_pocket(
            p, r, pocket, jnp.full((b,), 6), n_p, timesteps=T
        )
    )
    out = sample(params, jax.random.PRNGKey(1))
    np.asarray(out[0].x)  # full sync
    t0 = time.perf_counter()
    out = sample(params, jax.random.PRNGKey(2))
    np.asarray(out[0].x)
    dt = time.perf_counter() - t0
    results["stage1_sampled_clouds_per_min"] = round(b / dt * 60, 1)

    # ---- stage 3: GCPG decode (SMILES/min)
    train_smiles = [
        "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "CCN(CC)CC",
        "CC(C)Cc1ccc(C(C)C(=O)O)cc1",
    ]
    tok = Tokenizer(gen_vocabs(train_smiles))
    gmodel = GCPG(GCPGModelConfig(), vocab_size=len(tok))
    gb = 64 if quick else 256
    py_rng = random.Random(0)
    pg = smiles_to_ppgraph("CC(=O)Oc1ccccc1C(=O)O", py_rng)
    pp_h = jnp.broadcast_to(jnp.asarray(pg[0]), (gb, 8, 8))
    pp_e = jnp.broadcast_to(jnp.asarray(pg[1]), (gb, 8, 8, 1))
    pp_m = jnp.broadcast_to(jnp.asarray(pg[2]), (gb, 8))
    conds = jnp.zeros((gb, 7))
    gparams = gmodel.init(
        jax.random.PRNGKey(3), jax.random.PRNGKey(4),
        jnp.zeros((2, 8), jnp.int32), jnp.ones((2, 8)),
        pp_h[:2], pp_e[:2], pp_m[:2], jnp.zeros((2, 8), jnp.int32),
        conds[:2],
    )
    gen = jax.jit(
        lambda p, r: gcpg_mod.generate(
            gmodel, p, r, pp_h, pp_e, pp_m, conds, random_sample=True
        )
    )
    toks = gen(gparams, jax.random.PRNGKey(5))
    np.asarray(toks)
    t0 = time.perf_counter()
    toks = gen(gparams, jax.random.PRNGKey(6))
    np.asarray(toks)
    dt = time.perf_counter() - t0
    results["stage3_decoded_smiles_per_min"] = round(gb / dt * 60, 1)

    # ---- host: canonicalization + match scoring (mol/min, single process)
    mols = [
        "CC(=O)Oc1ccccc1C(=O)O",
        "Cc1ccc(-c2cc(C(F)(F)F)nn2-c2ccc(S(N)(=O)=O)cc2)cc1",
        "CCCc1nn(C)c2c(=O)[nH]c(-c3cc(S(=O)(=O)N4CCN(C)CC4)ccc3OCC)nc12",
    ] * (10 if quick else 40)
    t0 = time.perf_counter()
    for s in mols:
        canonical_smiles(s)
    results["host_canonicalize_per_min"] = round(
        len(mols) / (time.perf_counter() - t0) * 60, 1
    )
    # single-process steady-state rate (the pool scales ~linearly with
    # workers once spawn startup is amortized over large batches)
    t0 = time.perf_counter()
    scores = get_match_scores(
        [tuple(np.asarray(a) for a in pg[:3])] * len(mols[:24]),
        mols[:24], n_workers=1, timeout=20,
    )
    results["host_match_score_per_min_1worker"] = round(
        24 / (time.perf_counter() - t0) * 60, 1
    )

    # ---- stage 4: conformer embedding + alignment (mol/min)
    pp_coords = np.array(
        [[0.0, 0, 0], [4.0, 0, 0], [0, 4.0, 0]], dtype=np.float32
    )
    pp_types = ["AROM", "HACC", "HYBL"]
    n_align = 12 if quick else 48
    rng_a = jax.random.PRNGKey(7)
    batch = [mols[i % 3] for i in range(n_align)]
    # warm compile (per size bucket)
    align_batch(batch, pp_coords, pp_types, rng_a, n_conformers=10)
    t0 = time.perf_counter()
    res = align_batch(batch, pp_coords, pp_types, rng_a, n_conformers=10)
    dt = time.perf_counter() - t0
    results["stage4_aligned_mols_per_min"] = round(n_align / dt * 60, 1)
    results["stage4_align_success"] = len(res) / n_align

    bottleneck = min(
        results["stage1_sampled_clouds_per_min"],
        results["stage3_decoded_smiles_per_min"],
        results["stage4_aligned_mols_per_min"],
    )
    results["pipeline_bottleneck_mols_per_min"] = bottleneck
    print(json.dumps(results))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
