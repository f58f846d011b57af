"""MEASURED_E2E: trained-weights end-to-end pipeline, quality x throughput.

VERDICT r2 next-round item 2: one run that goes real pocket geometry ->
sampled pharmacophore clouds -> GMM consensus -> generated SMILES ->
aligned conformers with NO fixture substitution, using the round-3
quality-trained DiffPhar (EMA params) and GCPG checkpoints, reporting
aligned-molecules/min AND validity / match score / RMSD from the SAME run.

Prereqs (both produced by benchmarks/quality_eval.py with --workdir):
  --diff-workdir  DIR with data/test.npz + ckpt/{last,best}
  --gcpg-workdir  DIR with gcpg_ckpt/{last,best}

Run: python benchmarks/e2e_trained.py --diff-workdir /tmp/qrun3 \
       --gcpg-workdir /tmp/grun3 [--pockets 3] [--clamp-x 20]
Prints ONE JSON line (the MEASURED_E2E record for PERF.md).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import random as _random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def load_diffphar(workdir, neighbor_k, clamp_x, ckpt_name="last",
                  ddim_eta=None):
    from cmdgen_tpu import config as cfgmod
    from cmdgen_tpu.train import checkpoint as ckptmod
    from cmdgen_tpu.train.diffphar_train import build_model

    payload, meta = ckptmod.load_checkpoint(
        pathlib.Path(workdir) / "ckpt", ckpt_name
    )
    params = ckptmod.eval_params_from_payload(payload)
    cfg = cfgmod.from_dict(cfgmod.DiffPharConfig, meta["config"])
    ddpm = cfg.ddpm
    if clamp_x:
        ddpm = dataclasses.replace(ddpm, clamp_x=clamp_x)
    if ddim_eta is not None:
        ddpm = dataclasses.replace(ddpm, ddim_eta=ddim_eta)
    cfg = dataclasses.replace(
        cfg,
        ddpm=ddpm,
        dynamics=dataclasses.replace(
            cfg.dynamics,
            egnn=dataclasses.replace(
                cfg.dynamics.egnn,
                neighbor_k=neighbor_k,
                compute_dtype=jnp.bfloat16,
            ),
        ),
    )
    return build_model(cfg), params, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff-workdir", required=True)
    ap.add_argument("--gcpg-workdir", required=True)
    ap.add_argument("--pockets", type=int, default=3)
    ap.add_argument("--neighbor-k", type=int, default=16)
    ap.add_argument("--clamp-x", type=float, default=None)
    ap.add_argument("--ddim-eta", type=float, default=None)
    ap.add_argument("--diff-ckpt-name", default="last",
                    choices=["last", "best"])
    ap.add_argument("--gcpg-ckpt-name", default="last",
                    choices=["last", "best"])
    ap.add_argument("--timesteps", type=int, default=None)
    ap.add_argument("--clouds", type=int, default=64)
    ap.add_argument("--smiles-per-hypothesis", type=int, default=512)
    ap.add_argument("--cluster-counts", type=int, nargs="+", default=[4, 5])
    ap.add_argument("--match-sample", type=int, default=128,
                    help="SMILES scored per hypothesis for the match score")
    ap.add_argument("--decode-temperature", type=float, nargs="+",
                    default=[1.0],
                    help="sampling-logit temperature(s) for the SMILES "
                    "decode; several values sweep variants in ONE process "
                    "(the warmup compiles are shared — temperature is a "
                    "traced scalar)")
    ap.add_argument("--validity-gate", type=float, nargs="+", default=None,
                    help="per-hypothesis validity gate threshold(s); "
                    "negative = gate off; crossed with the temperature "
                    "list (one measured run + JSON row per combination)")
    ap.add_argument("--gate-probe", type=int, default=256,
                    help="probe decodes per hypothesis for the gate")
    ap.add_argument("--constrain-decode", action="store_true",
                    help="syntax-constrained SMILES decoding (mask "
                    "unclosable/special tokens during sampling)")
    ap.add_argument("--constrain-valence", action="store_true",
                    help="additionally mask valence-overflow "
                    "continuations (per-atom bond budgets)")
    ap.add_argument("--keep-top-match-frac", type=float, default=None,
                    help="rank aligned output by pharmacophore match and "
                    "keep this fraction (virtual-screening selection); "
                    "reports kept_mols_per_min incl. ranking time")
    # align-stage throughput knobs: validity and the match score are
    # SMILES-level metrics, so conformer count / refinement only trade
    # RMSD quality for align-stage speed (the bottleneck once the GCPG
    # matches well: 74 of 120 busy-seconds in the round-5 warmup)
    ap.add_argument("--n-conformers", type=int, default=5)
    ap.add_argument("--refine-steps", type=int, default=100)
    ap.add_argument("--align-chunk", type=int, default=64)
    args = ap.parse_args()

    from cmdgen_tpu.chem.match import get_match_scores
    from cmdgen_tpu.chem.posp import points_to_graph
    from cmdgen_tpu.cli import _load_gcpg_ckpt
    from cmdgen_tpu.data.dataset import DiffPharDataset
    from cmdgen_tpu.pipeline import run_all

    diff_model, diff_params, dcfg = load_diffphar(
        args.diff_workdir, args.neighbor_k, args.clamp_x,
        ckpt_name=args.diff_ckpt_name, ddim_eta=args.ddim_eta,
    )
    gmodel, gparams, tok = _load_gcpg_ckpt(
        pathlib.Path(args.gcpg_workdir) / "gcpg_ckpt", args.gcpg_ckpt_name
    )
    test_ds = DiffPharDataset(
        pathlib.Path(args.diff_workdir) / "data" / "test.npz"
    )
    mk_pocket = lambda i: (
        test_ds.pocket_coords[i].astype(np.float32),
        test_ds.pocket_one_hot[i].astype(np.float32),
    )

    gates = [g if g >= 0 else None for g in (args.validity_gate or [-1.0])]
    variants = [(t, g) for t in args.decode_temperature for g in gates]

    pcfg = run_all.PipelineConfig(
        n_clouds_per_pocket=args.clouds,
        diff_timesteps=args.timesteps,
        n_phar_max=8,
        cluster_counts=tuple(args.cluster_counts),
        smiles_per_hypothesis=args.smiles_per_hypothesis,
        decode_batch=min(512, args.smiles_per_hypothesis),
        decode_temperature=variants[0][0],
        keep_top_match_frac=args.keep_top_match_frac,
        n_conformers=args.n_conformers,
        refine_steps=args.refine_steps,
        align_chunk=args.align_chunk,
        num_keep=min(3, args.n_conformers),
        validity_probe=args.gate_probe,
        constrain_decode=args.constrain_decode,
        constrain_valence=args.constrain_valence,
    )

    # warmup compiles every jit shape once (excluded from measurement) —
    # with bucketed pocket padding that means one pocket per size BUCKET
    # present in the measured set (distinct buckets are distinct shapes)
    pockets = [mk_pocket(i) for i in range(args.pockets)]
    bucket = pcfg.pocket_pad_bucket or 1
    warm_by_bucket = {}
    for i in range(args.pockets):
        warm_by_bucket.setdefault(
            -(-pockets[i][0].shape[0] // bucket), i)
    t0 = time.perf_counter()
    _, warm = run_all.run_pipeline(
        diff_model, diff_params, gmodel, gparams, tok,
        [mk_pocket(i) for i in warm_by_bucket.values()],
        jax.random.PRNGKey(1), pcfg,
    )
    print(f"# warmup {time.perf_counter() - t0:.1f}s "
          f"({len(warm_by_bucket)} buckets): {warm}", file=sys.stderr)
    for temp, gate in variants:
        vcfg = dataclasses.replace(
            pcfg, decode_temperature=temp, validity_gate=gate
        )
        collect: dict = {}
        results, stats = run_all.run_pipeline(
            diff_model, diff_params, gmodel, gparams, tok,
            pockets, jax.random.PRNGKey(7), vcfg, collect=collect,
        )
        _report(args, dcfg, collect, results, stats, temp, gate)


def _report(args, dcfg, collect, results, stats, temp, gate):
    from cmdgen_tpu.chem.match import get_match_scores
    from cmdgen_tpu.chem.posp import points_to_graph

    # ---- quality from the same run
    out = dict(stats)
    out["validity"] = round(stats["valid_smiles"] / max(stats["raw_smiles"], 1), 4)
    out["uniq_rate"] = round(
        stats["unique_smiles"] / max(stats["valid_smiles"], 1), 4
    )
    out["feature_match_rate"] = round(
        stats["matched"] / max(stats["unique_smiles"], 1), 4
    )
    if results:
        out["rmsd_mean"] = round(
            float(np.mean([r.rmsd for r in results])), 3
        )
        out["rmsd_p90"] = round(
            float(np.percentile([r.rmsd for r in results], 90)), 3
        )
    # pharmacophore match score on a sample per hypothesis (match_eval.py
    # semantics: fraction of pairwise bond-path distances within 1.21)
    py_rng = _random.Random(0)
    graphs, smiles = [], []
    for hid, (types, ppc) in collect.get("hypotheses", {}).items():
        uniq = collect.get("uniq", {}).get(hid, [])
        if not uniq:
            continue
        g = points_to_graph(list(types), ppc, py_rng)
        for s in uniq[: args.match_sample]:
            graphs.append(tuple(np.asarray(a) for a in g))
            smiles.append(s)
    if smiles:
        scores = get_match_scores(graphs, smiles, n_workers=4, timeout=20)
        ok = [s for s in scores if s >= 0]
        out["match_score_mean"] = (
            round(float(np.mean(ok)), 4) if ok else -1.0
        )
        out["match_scored_n"] = len(ok)
    # match score of the pipeline's actual OUTPUT set (the aligned
    # molecules a user receives), vs the random-sample score above which
    # includes decodes the tolerance filter rejected
    hyp_graphs = {
        hid: points_to_graph(list(types), ppc, py_rng)
        for hid, (types, ppc) in collect.get("hypotheses", {}).items()
    }
    ag, asmi = [], []
    results_sample = list(results)
    py_rng.shuffle(results_sample)  # not hypothesis-ordered
    for r in results_sample[: 4 * args.match_sample]:
        g = hyp_graphs.get(r.hypothesis)
        if g is None:
            continue
        ag.append(tuple(np.asarray(a) for a in g))
        asmi.append(r.smiles)
    if asmi:
        scores = get_match_scores(ag, asmi, n_workers=4, timeout=20)
        ok = [s for s in scores if s >= 0]
        out["match_score_aligned"] = (
            round(float(np.mean(ok)), 4) if ok else -1.0
        )
        out["match_aligned_n"] = len(ok)
    out["vs_target_1k_per_min"] = round(
        stats["aligned_mols_per_min"] / 1000.0, 3
    )
    if args.keep_top_match_frac is not None and "kept" in stats:
        # throughput of the SELECTED output set, charging the ranking time
        out["kept_mols_per_min"] = round(
            stats["kept"]
            / (stats["wall_s"] + stats.get("match_rank_busy_s", 0.0))
            * 60.0,
            1,
        )
    out["clamp_x"] = args.clamp_x
    out["timesteps"] = args.timesteps or dcfg.ddpm.timesteps
    if temp != 1.0:
        out["decode_temperature"] = temp
    if gate is not None:
        out["validity_gate"] = gate
    if args.constrain_decode:
        out["constrain_decode"] = True
    if args.constrain_valence:
        out["constrain_valence"] = True
    hv = collect.get("hyp_validity", {})
    if hv:
        vals = sorted(hv.values())
        out["hyp_validity_min"] = round(vals[0], 3)
        out["hyp_validity_median"] = round(vals[len(vals) // 2], 3)
        out["hyp_validity_max"] = round(vals[-1], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
