"""Unified command-line interface for every pipeline stage.

Replaces the reference's scattered per-stage CLIs (DiffPhar/train.py,
generate_phars.py, test.py; GCPG/train_chembl33_baseline.py, generate.py,
generate_docked.py, test_generation.py; get_phar/*.py; PharAlign/align.sh)
with one entry point:

  python -m cmdgen_tpu.cli <command> [...]

Commands: preprocess, train-diffphar, sample-phars, get-phar, train-gcpg,
finetune-gcpg, generate, align, eval-diffphar, eval-gcpg.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def _add_preprocess(sub):
    p = sub.add_parser("preprocess", help="CrossDocked (PDB, SDF) pairs -> npz")
    p.add_argument("pairs_file", help="TSV: split<TAB>pocket.pdb<TAB>ligand.sdf")
    p.add_argument("out_dir")
    p.add_argument("--dataset", default="crossdock_full",
                   choices=["crossdock_full", "crossdock"])
    p.add_argument("--representation", default="full-atom",
                   choices=["full-atom", "CA"])

    def run(args):
        from cmdgen_tpu.data.crossdocked import process_dataset

        pairs = []
        for line in Path(args.pairs_file).read_text().strip().split("\n"):
            split, pdb, sdf = line.split("\t")
            pairs.append((split, pdb, sdf))
        stats = process_dataset(
            pairs, args.out_dir, args.dataset, args.representation
        )
        print(json.dumps(stats))

    p.set_defaults(run=run)


def _add_train_diffphar(sub):
    p = sub.add_parser("train-diffphar", help="train the diffusion model")
    p.add_argument("datadir")
    p.add_argument("out_dir")
    p.add_argument("--config", default="full", choices=["full", "ca"])
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument(
        "--neighbor-k", type=int, default=None,
        help="fixed-K neighbor-list EGNN engine (exact when K bounds the "
             "in-cutoff neighbor count; realistic pockets max ~11; "
             "K=12 is ~4x faster than the dense default — see PERF.md)",
    )
    p.add_argument(
        "--steps-per-call", type=int, default=None,
        help="fuse N update steps under one lax.scan per device call "
             "(amortizes per-call dispatch latency; see train/state.py)",
    )
    p.add_argument(
        "--ema-decay", type=float, default=None,
        help="keep an EMA of params for sampling/eval (e.g. 0.999; "
             "0/absent = off, reference behavior)",
    )
    p.add_argument(
        "--stratified-t", action="store_true",
        help="low-discrepancy timestep sampling across the batch "
             "(per-sample marginal unchanged; lower gradient variance)",
    )
    p.add_argument(
        "--fsdp", action="store_true",
        help="ZeRO-3-style FSDP: shard params + optimizer state over the "
             "dp mesh axis (GSPMD all-gathers at use, reduce-scatters "
             "grads); see parallel/mesh.py:fsdp_sharding",
    )

    def run(args):
        import dataclasses

        from cmdgen_tpu import config as cfgmod
        from cmdgen_tpu.train.diffphar_train import train_diffphar

        cfg = (
            cfgmod.full_atom_config() if args.config == "full"
            else cfgmod.ca_config()
        )
        tr = cfg.train
        if args.epochs:
            tr = dataclasses.replace(tr, n_epochs=args.epochs)
        if args.batch_size:
            tr = dataclasses.replace(tr, batch_size=args.batch_size)
        if args.steps_per_call:
            tr = dataclasses.replace(tr, steps_per_call=args.steps_per_call)
        if args.ema_decay:
            tr = dataclasses.replace(tr, ema_decay=args.ema_decay)
        if args.fsdp:
            tr = dataclasses.replace(tr, fsdp=True)
        cfg = dataclasses.replace(cfg, train=tr)
        if args.stratified_t:
            cfg = dataclasses.replace(
                cfg, ddpm=dataclasses.replace(cfg.ddpm, stratified_t=True)
            )
        if args.neighbor_k:
            cfg = dataclasses.replace(
                cfg,
                dynamics=dataclasses.replace(
                    cfg.dynamics,
                    egnn=dataclasses.replace(
                        cfg.dynamics.egnn, neighbor_k=args.neighbor_k
                    ),
                ),
            )
        from cmdgen_tpu.utils.logging import MetricsLogger

        logger = MetricsLogger(args.out_dir, cfg.train.run_name)
        train_diffphar(
            cfg, args.datadir, args.out_dir, max_steps=args.max_steps,
            log_fn=logger.log,
        )

    p.set_defaults(run=run)


def _load_diffphar_ckpt(ckpt_dir, which="best"):
    import dataclasses

    import numpy as np

    from cmdgen_tpu import config as cfgmod
    from cmdgen_tpu.train import checkpoint as ckpt
    from cmdgen_tpu.train.diffphar_train import build_model

    payload, meta = ckpt.load_checkpoint(ckpt_dir, which)
    cfg = cfgmod.from_dict(cfgmod.DiffPharConfig, meta["config"])
    model = build_model(cfg)
    # sample with the EMA params when the run kept them (ema_decay > 0)
    params = ckpt.eval_params_from_payload(payload)
    return model, params, cfg


def _add_sample_phars(sub):
    p = sub.add_parser("sample-phars", help="sample pharmacophores for a pocket")
    p.add_argument("ckpt_dir")
    p.add_argument("pdbfile")
    p.add_argument("out_json")
    p.add_argument("--ref-ligand", default=None, help="chain:resid")
    p.add_argument("--resi-list", nargs="*", default=None)
    p.add_argument("--n-samples", type=int, default=100)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--neighbor-k", type=int, default=None,
        help="sample with the fixed-K neighbor-list engine regardless of "
             "the training engine (same parameters, same function when K "
             "bounds the in-cutoff neighbor count; K=12 is ~4x faster)",
    )
    p.add_argument(
        "--chain-gif", default=None, metavar="PATH",
        help="also render one sampling chain as an animated GIF "
             "(analysis/visualization.py:343-369 equivalent)",
    )
    p.add_argument(
        "--ddim-eta", type=float, default=None,
        help="sample with the DDIM reverse chain at this eta (0 = "
             "deterministic probability-flow corner; default ancestral "
             "DDPM, the reference sampler)",
    )
    p.add_argument(
        "--clamp-x", type=float, default=None,
        help="static coordinate thresholding (normalized Å) during "
             "sampling (Imagen-style stabilization; default off)",
    )

    def run(args):
        import dataclasses

        import jax

        from cmdgen_tpu.pipeline.sample_phars import sample_phars_to_json
        from cmdgen_tpu.train.diffphar_train import build_model

        model, params, cfg = _load_diffphar_ckpt(args.ckpt_dir)
        if args.ddim_eta is not None or args.clamp_x is not None:
            ddpm = cfg.ddpm
            if args.ddim_eta is not None:
                ddpm = dataclasses.replace(ddpm, ddim_eta=args.ddim_eta)
            if args.clamp_x is not None:
                ddpm = dataclasses.replace(ddpm, clamp_x=args.clamp_x)
            cfg = dataclasses.replace(cfg, ddpm=ddpm)
            model = build_model(cfg)
        if args.neighbor_k:
            cfg = dataclasses.replace(
                cfg,
                dynamics=dataclasses.replace(
                    cfg.dynamics,
                    egnn=dataclasses.replace(
                        cfg.dynamics.egnn, neighbor_k=args.neighbor_k
                    ),
                ),
            )
            model = build_model(cfg)
        sample_phars_to_json(
            model, params, jax.random.PRNGKey(args.seed), args.pdbfile,
            args.out_json, dataset=cfg.data.dataset,
            representation=cfg.data.pocket_representation,
            ref_ligand=args.ref_ligand, resi_list=args.resi_list,
            n_samples=args.n_samples, timesteps=args.timesteps,
        )
        print(f"wrote {args.out_json}")
        if args.chain_gif:
            from cmdgen_tpu.pipeline.sample_phars import pocket_point_cloud
            from cmdgen_tpu.utils.visualization import render_chain_for_pocket

            coords, onehot = pocket_point_cloud(
                args.pdbfile, cfg.data.dataset,
                cfg.data.pocket_representation,
                args.ref_ligand, args.resi_list,
            )
            render_chain_for_pocket(
                model, params, jax.random.PRNGKey(args.seed + 1),
                coords, onehot, args.chain_gif,
                timesteps=args.timesteps,
            )
            print(f"wrote {args.chain_gif}")

    p.set_defaults(run=run)


def _add_get_phar(sub):
    p = sub.add_parser("get-phar", help="consensus clustering -> .posp")
    p.add_argument("cloud_json")
    p.add_argument("out_posp")
    p.add_argument("--method", default="gmm", choices=["gmm", "kmeans", "dbscan"])
    p.add_argument("--n-clusters", type=int, default=7)
    p.add_argument("--eps", type=float, default=0.2)
    p.add_argument("--min-samples", type=int, default=12)
    p.add_argument("--dual-json", default=None,
                   help="second target cloud: dual-target mode")
    p.add_argument("--dual-mode", default="gmm",
                   choices=["gmm", "dbscan", "indiv"],
                   help="dual-target clusterer: pooled GMM "
                        "(point_dultarget.py), standardized DBSCAN "
                        "(point_dultarget_DBSCAN.py), or per-set GMM + "
                        "cross-set merge (point_dultarget_indiv.py)")
    p.add_argument("--select-json", default=None,
                   help="anti-target cloud: selectivity mode")
    p.add_argument("--seed", type=int, default=42)

    def run(args):
        from cmdgen_tpu.pipeline import get_phar as gp

        coords, fams = gp.load_point_cloud_json(args.cloud_json)
        if args.dual_json:
            c2, f2 = gp.load_point_cloud_json(args.dual_json)
            out = Path(args.out_posp)
            if args.dual_mode == "indiv":
                cons = gp.dual_target_consensus_indiv(
                    coords, fams, c2, f2, n_clusters=args.n_clusters,
                    seed=args.seed,
                )
                gp.write_consensus(out.with_suffix(".dual_indiv.posp"), cons)
                print(f"wrote {out.with_suffix('.dual_indiv.posp')}")
                return
            cons2, cons1 = gp.dual_target_consensus(
                coords, fams, c2, f2, n_clusters=args.n_clusters,
                seed=args.seed, method=args.dual_mode,
                dbscan_eps=args.eps, dbscan_min_samples=args.min_samples,
            )
            gp.write_consensus(out.with_suffix(".dual1.posp"), cons1)
            gp.write_consensus(out.with_suffix(".dual2.posp"), cons2)
            print(f"wrote {out.with_suffix('.dual1.posp')} and .dual2.posp")
            return
        if args.select_json:
            c2, _ = gp.load_point_cloud_json(args.select_json)
            cons = gp.selective_consensus(
                coords, fams, c2, eps=args.eps, min_samples=args.min_samples
            )
        elif args.method == "gmm":
            cons = gp.consensus_gmm(coords, fams, args.n_clusters, args.seed)
        elif args.method == "kmeans":
            cons = gp.consensus_kmeans(coords, fams, args.n_clusters, args.seed)
        else:
            cons = gp.consensus_dbscan(
                coords, fams, eps=args.eps, min_samples=args.min_samples
            )
        gp.write_consensus(args.out_posp, cons)
        print(f"wrote {args.out_posp} ({len(cons)} points)")

    p.set_defaults(run=run)


def _read_smiles_and_props(smiles_file, props_file=None):
    smiles = Path(smiles_file).read_text().strip().split("\n")
    if props_file:
        props = json.loads(Path(props_file).read_text())
    else:
        from cmdgen_tpu.chem.descriptors import all_properties

        keys = ["MW", "logP", "QED", "SAS", "HBA", "HBD", "RotaNumBonds"]
        props = {k: [] for k in keys}
        kept = []
        for s in smiles:
            p = all_properties(s)
            if p is None:
                continue
            kept.append(s)
            for k in keys:
                props[k].append(p[k])
        smiles = kept
    return smiles, props


def _add_train_gcpg(sub):
    p = sub.add_parser("train-gcpg", help="train the SMILES generator")
    p.add_argument("smiles_file")
    p.add_argument("out_dir")
    p.add_argument("--props-json", default=None)
    p.add_argument("--epochs", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--finetune-from", default=None)
    p.add_argument("--score-only-gate", action="store_true",
                   help="docking-finetune condition gate [0,0,0,0,0,1,0]")
    p.add_argument("--legacy-no-condition", action="store_true",
                   help="PGMG-style unconditional baseline (the reference's "
                        "legacy ChEMBL24 run, train_chembl_baseline.py: a "
                        "model with no property head). Zero condition gate "
                        "+ zero condition inputs: the learned cond token "
                        "degenerates to a constant, behaviorally a model "
                        "without the condition input. Skips descriptor "
                        "computation (the legacy script computes none).")
    p.add_argument("--consensus-noise", type=float, default=0.0,
                   help="fraction of training pp-graphs re-drawn consensus-"
                        "style (decode-time size prior + distance jitter) — "
                        "closes the train/serve graph-distribution gap")

    def run(args):
        import dataclasses

        from cmdgen_tpu.config import GCPGModelConfig, GCPGTrainConfig
        from cmdgen_tpu.train.gcpg_train import FINETUNE_GATE, train_gcpg

        if args.legacy_no_condition:
            from cmdgen_tpu.data.dataset import PROPERTY_KEYS

            smiles = [
                s for s in
                Path(args.smiles_file).read_text().strip().split("\n") if s
            ]
            props = {k: [0.0] * len(smiles) for k in PROPERTY_KEYS}
        else:
            smiles, props = _read_smiles_and_props(
                args.smiles_file, args.props_json
            )
        tcfg = GCPGTrainConfig(
            batch_size=args.batch_size, n_epochs=args.epochs,
            consensus_noise=args.consensus_noise,
        )
        if args.score_only_gate:
            tcfg = dataclasses.replace(tcfg, condition_gate=FINETUNE_GATE)
        if args.legacy_no_condition:
            tcfg = dataclasses.replace(tcfg, condition_gate=(0,) * 7)
        from cmdgen_tpu.utils.logging import MetricsLogger

        logger = MetricsLogger(args.out_dir, "gcpg")
        train_gcpg(
            GCPGModelConfig(), tcfg, smiles, props, args.out_dir,
            max_steps=args.max_steps, finetune_from=args.finetune_from,
            log_fn=logger.log,
        )

    p.set_defaults(run=run)


def _load_gcpg_ckpt(ckpt_dir, which="best"):
    from cmdgen_tpu import config as cfgmod
    from cmdgen_tpu.chem.tokenizer import Tokenizer
    from cmdgen_tpu.models.gcpg import GCPG
    from cmdgen_tpu.train import checkpoint as ckpt

    payload, meta = ckpt.load_checkpoint(ckpt_dir, which)
    tokenizer = Tokenizer.from_list(meta["config"]["tokenizer"])
    mcfg = cfgmod.from_dict(cfgmod.GCPGModelConfig, meta["config"]["model"])
    model = GCPG(mcfg, vocab_size=len(tokenizer))
    return model, payload["params"], tokenizer


def _add_generate(sub):
    p = sub.add_parser("generate", help=".posp -> SMILES")
    p.add_argument("phar_file")
    p.add_argument("out_dir")
    p.add_argument("ckpt_dir")
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--target-score", type=float, default=0.0,
                   help="docking-score condition (generate_docked.py uses -14)")
    p.add_argument("--no-filter", action="store_true")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="sampling-logit temperature (<1 sharpens)")
    p.add_argument("--constrain-decode", action="store_true",
                   help="syntax-constrained decoding: mask tokens that "
                        "would leave rings/parens unclosable (and "
                        "special tokens) during sampling")
    p.add_argument("--constrain-valence", action="store_true",
                   help="additionally mask valence-overflow "
                        "continuations (per-atom bond budgets)")
    p.add_argument("--seed", type=int, default=0)

    def run(args):
        import jax

        from cmdgen_tpu.pipeline.generate_smiles import generate_to_file

        model, params, tokenizer = _load_gcpg_ckpt(args.ckpt_dir)
        out = generate_to_file(
            model, params, tokenizer, jax.random.PRNGKey(args.seed),
            args.phar_file, args.out_dir, n_per_condition=args.n,
            conditions={"Score": [args.target_score]},
            filter_valid=not args.no_filter,
            temperature=args.temperature,
            constrain=args.constrain_decode,
            constrain_valence=args.constrain_valence,
        )
        print(f"wrote {out}")

    p.set_defaults(run=run)


def _add_run_all(sub):
    p = sub.add_parser(
        "run-all",
        help="pocket PDB(s) -> aligned molecules, one overlapped run "
             "(sample -> consensus -> generate -> align as a streaming "
             "driver instead of four file-to-file stages)",
    )
    p.add_argument("diff_ckpt", help="DiffPhar checkpoint dir")
    p.add_argument("gcpg_ckpt", help="GCPG checkpoint dir")
    p.add_argument("out_dir")
    p.add_argument("pdbfiles", nargs="+")
    p.add_argument("--ref-ligand", default=None, help="chain:resid")
    p.add_argument("--resi-list", nargs="*", default=None)
    p.add_argument("--n-clouds", type=int, default=64)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--consensus", default="gmm",
                   choices=["gmm", "kmeans", "dbscan"])
    p.add_argument("--cluster-counts", type=int, nargs="+", default=[4, 5])
    p.add_argument("--smiles-per-hypothesis", type=int, default=256)
    p.add_argument("--decode-batch", type=int, default=None,
                   help="decode batch size (default: min(512, "
                        "smiles-per-hypothesis); 512 is the tuned optimum)")
    p.add_argument("--n-conformers", type=int, default=5)
    p.add_argument("--neighbor-k", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--contact-filter", type=float, default=6.0,
                   help="drop sampled points farther than this (Å) from "
                        "the nearest pocket atom before consensus "
                        "(0 disables; data p99 contact is ~4.1 Å)")
    p.add_argument("--ddim-eta", type=float, default=None,
                   help="DDIM reverse chain at this eta for the cloud "
                        "sampler (0 = deterministic; default ancestral)")
    p.add_argument("--clamp-x", type=float, default=None,
                   help="static coordinate thresholding (Å) during cloud "
                        "sampling")
    p.add_argument("--keep-top-match", type=float, default=None,
                   metavar="FRAC",
                   help="rank aligned molecules by pharmacophore match "
                        "score and keep only this top fraction "
                        "(virtual-screening selection; stats report the "
                        "all-aligned AND kept match means)")
    p.add_argument("--decode-temperature", type=float, default=1.0,
                   help="sampling-logit temperature for the SMILES "
                        "decode (<1 sharpens: higher validity on "
                        "out-of-distribution hypotheses)")
    p.add_argument("--validity-gate", type=float, default=None,
                   metavar="THRESH",
                   help="per-hypothesis validity gate: decode a probe "
                        "batch first and skip hypotheses whose probe "
                        "validity is below THRESH (the GCPG is ~0.97 "
                        "valid in-distribution; gating ships only from "
                        "hypotheses it handles well)")
    p.add_argument("--gate-probe", type=int, default=256,
                   help="probe decodes per hypothesis for --validity-gate")
    p.add_argument("--constrain-decode", action="store_true",
                   help="syntax-constrained SMILES decoding (mask "
                        "unclosable/special tokens during sampling)")
    p.add_argument("--constrain-valence", action="store_true",
                   help="additionally mask valence-overflow "
                        "continuations (per-atom bond budgets)")

    def run(args):
        import dataclasses
        import json

        import jax

        from cmdgen_tpu.pipeline.run_all import (
            PipelineConfig,
            run_pipeline,
            write_pipeline_results,
        )
        from cmdgen_tpu.pipeline.sample_phars import pocket_point_cloud
        from cmdgen_tpu.train.diffphar_train import build_model

        model, params, cfg = _load_diffphar_ckpt(args.diff_ckpt)
        if args.ddim_eta is not None or args.clamp_x is not None:
            ddpm = cfg.ddpm
            if args.ddim_eta is not None:
                ddpm = dataclasses.replace(ddpm, ddim_eta=args.ddim_eta)
            if args.clamp_x is not None:
                ddpm = dataclasses.replace(ddpm, clamp_x=args.clamp_x)
            cfg = dataclasses.replace(cfg, ddpm=ddpm)
            model = build_model(cfg)
        if args.neighbor_k:
            cfg = dataclasses.replace(
                cfg,
                dynamics=dataclasses.replace(
                    cfg.dynamics,
                    egnn=dataclasses.replace(
                        cfg.dynamics.egnn, neighbor_k=args.neighbor_k
                    ),
                ),
            )
            model = build_model(cfg)
        gmodel, gparams, tokenizer = _load_gcpg_ckpt(args.gcpg_ckpt)
        pockets = [
            pocket_point_cloud(
                f, cfg.data.dataset, cfg.data.pocket_representation,
                ref_ligand=args.ref_ligand, resi_list=args.resi_list,
            )
            for f in args.pdbfiles
        ]
        pcfg = PipelineConfig(
            n_clouds_per_pocket=args.n_clouds,
            diff_timesteps=args.timesteps,
            cluster_counts=tuple(args.cluster_counts),
            consensus_method=args.consensus,
            smiles_per_hypothesis=args.smiles_per_hypothesis,
            decode_batch=(args.decode_batch if args.decode_batch
                          else min(512, args.smiles_per_hypothesis)),
            n_conformers=args.n_conformers,
            contact_filter=(args.contact_filter
                            if args.contact_filter > 0 else None),
            keep_top_match_frac=args.keep_top_match,
            decode_temperature=args.decode_temperature,
            validity_gate=args.validity_gate,
            validity_probe=args.gate_probe,
            constrain_decode=args.constrain_decode,
            constrain_valence=args.constrain_valence,
        )
        results, stats = run_pipeline(
            model, params, gmodel, gparams, tokenizer, pockets,
            jax.random.PRNGKey(args.seed), pcfg,
        )
        out = write_pipeline_results(results, args.out_dir)
        print(json.dumps(stats))
        print(f"wrote {out}")

    p.set_defaults(run=run)


def _add_align(sub):
    p = sub.add_parser(
        "align",
        help="align SMILES (or posed PDB ligands) onto a .posp",
    )
    p.add_argument("smiles_file",
                   help="SMILES list, or a dir/glob of pose PDBs with "
                        "--pose-pdbs")
    p.add_argument("posp_file")
    p.add_argument("out_dir")
    p.add_argument("--n-conformers", type=int, default=10)
    p.add_argument("--num-keep", type=int, default=3)
    p.add_argument("--tolerance", type=int, default=0)
    p.add_argument("--pose-pdbs", action="store_true",
                   help="treat the first argument as a directory of "
                        "docked-pose PDB ligands and run the RMSD-vs-pose "
                        "eval (align_ligandpharm_gcpg_test.py)")
    p.add_argument("--ref-ligand", default=None,
                   help="chain:resid selector inside each pose PDB "
                        "(default: all non-water HETATM/ATOM heavy atoms)")

    def run(args):
        if args.pose_pdbs:
            from cmdgen_tpu.pipeline.evaluate import eval_alignment_rmsd_posed

            pose_dir = Path(args.smiles_file)
            paths = sorted(pose_dir.glob("*.pdb")) if pose_dir.is_dir() else [
                pose_dir
            ]
            out = eval_alignment_rmsd_posed(
                paths, args.posp_file, ref_ligand=args.ref_ligand,
                n_conformers=args.n_conformers,
                tolerance=args.tolerance, out_dir=args.out_dir,
            )
            out.pop("rmsd_values")
            print(json.dumps({k: round(float(v), 4) for k, v in out.items()}))
            return
        from cmdgen_tpu.pipeline.align import align_smiles_list

        smiles = Path(args.smiles_file).read_text().strip().split("\n")
        best = align_smiles_list(
            smiles, args.posp_file, args.out_dir,
            n_conformers=args.n_conformers, num_keep=args.num_keep,
            tolerance=args.tolerance,
        )
        print(json.dumps({k: round(v, 3) for k, v in best.items()}))

    p.set_defaults(run=run)


def _add_eval(sub):
    p = sub.add_parser("eval-diffphar", help="distribution-match eval")
    p.add_argument("ckpt_dir")
    p.add_argument("test_npz")
    p.add_argument("--n-pockets", type=int, default=20)

    def run(args):
        import jax

        from cmdgen_tpu.data.dataset import DiffPharDataset
        from cmdgen_tpu.pipeline.evaluate import eval_diffphar

        model, params, cfg = _load_diffphar_ckpt(args.ckpt_dir)
        ds = DiffPharDataset(args.test_npz)
        out = eval_diffphar(
            model, params, jax.random.PRNGKey(0), ds, args.n_pockets
        )
        print(json.dumps(out))

    p.set_defaults(run=run)

    q = sub.add_parser("eval-gcpg", help="generation quality eval")
    q.add_argument("ckpt_dir")
    q.add_argument("test_smiles_file")
    q.add_argument("--n", type=int, default=100)

    def run_q(args):
        import jax

        from cmdgen_tpu.pipeline.evaluate import eval_gcpg

        model, params, tokenizer = _load_gcpg_ckpt(args.ckpt_dir)
        smiles = Path(args.test_smiles_file).read_text().strip().split("\n")
        out = eval_gcpg(
            model, params, tokenizer, jax.random.PRNGKey(0), smiles, args.n
        )
        print(json.dumps(out))

    q.set_defaults(run=run_q)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="cmdgen_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = parser.add_subparsers(dest="command", required=True)
    _add_preprocess(sub)
    _add_train_diffphar(sub)
    _add_sample_phars(sub)
    _add_get_phar(sub)
    _add_train_gcpg(sub)
    _add_generate(sub)
    _add_align(sub)
    _add_run_all(sub)
    _add_eval(sub)
    args = parser.parse_args(argv)
    args.run(args)


if __name__ == "__main__":
    main()
