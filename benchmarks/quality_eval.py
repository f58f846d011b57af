"""Round-2 quality-parity baselines (VERDICT r1 item 7).

Trains both models at the largest in-session scale and runs the reference
eval suites end to end, printing ONE JSON line of measured quality metrics
(not loss curves):

- GCPG (reference eval: GCPG/utils/match_eval.py:187-198 +
  test_generation.py): train on a generated drug-fragment corpus, then
  validity / uniqueness / novelty / internal diversity / pharmacophore
  match rate on held-out test pharmacophores.
- DiffPhar (reference eval: DiffPhar/test.py:34-227): train the conditional
  DDPM on a synthetic-but-structured pocket/pharmacophore dataset with a
  fixed type histogram, then type-KL and CoM/spread distribution metrics
  via pipeline/evaluate.eval_diffphar.

Corpora are synthetic (no ChEMBL/CrossDocked in this environment — the
machinery, losses, and eval chain are the real thing; the chemistry is
fragment-grammar molecules).

Run: python benchmarks/quality_eval.py [--quick]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import random
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def make_corpus(n=8000, seed=0, max_atoms=38, long_frac=0.0,
                complexity_frac=0.0, ion_frac=0.0):
    """Drug-fragment-grammar molecules: ring cores with substituents plus
    fragment chains — richer than train_demo's (branches, heterocycles,
    multiple rings), sized like ChEMBL drugs.

    ``long_frac`` builds that fraction of molecules as three-core chains
    (core-link-core-link-core): their far-apart pharmacophore features
    cover shortest-path distances ~7-13, the range DiffPhar-consensus
    hypotheses actually condition on (measured median sdis ~7.6, max ~11
    — e2e conditioning is out-of-distribution for the two-core grammar,
    whose sdis median is 3.9 / p90 7.0).

    ``complexity_frac`` builds that fraction at the two synthesizability
    extremes, half each: acyclic/one-small-ring "simple" molecules
    (built-in SAS ~1.4-3) and bridged/fused-polycyclic "complex" ones
    (SAS ~4-6.5). The base grammar clusters at SAS 4.5 +- 0.5 — too
    narrow for the SAS condition head to learn anything (PARITY.md part
    B: SAS was the one flat condition); this widens the SAS (and MW/logP)
    support so condition adherence stops being corpus-coverage-bound.

    ``ion_frac`` (round 5) builds that fraction of molecules as long-span
    ionizable chains: a guaranteed PosIonizable head (basic amine /
    guanidine / amidine) and a guaranteed NegIonizable tail (COOH /
    sulfonic / tetrazole) around a multi-core body. Rationale: consensus
    hypotheses from the DiffPhar stage emit POSC and UNKNOWN nodes
    (UNKNOWN <- NegIonizable + 'others' families, chem/posp.FAMILY2POSP,
    reference GMM_json.py:122-147), and the match scorer
    (chem/match.py:50-54; reference match_eval.py:83-125) can only
    satisfy those nodes with molecules that PHYSICALLY carry
    PosIonizable / others-family features — the round-3 measured
    corpus-attainable ceiling of 0.4-0.67 on such hypotheses is a
    corpus-composition bound, not a model bound. These molecules also
    put the POSC<->UNKNOWN pair at bond-path spans 6-13, the sdis tail
    consensus hypotheses condition on."""
    from cmdgen_tpu.chem.mol import canonical_smiles, mol_from_smiles

    rng = random.Random(seed)
    cores = [
        "c1ccccc1", "c1ccncc1", "c1cncnc1", "c1cc[nH]c1", "c1ccoc1",
        "c1ccsc1", "C1CCCCC1", "C1CCNCC1", "C1CCOCC1", "C1CNCCN1",
        "c1ccc2ccccc2c1", "c1ccc2[nH]ccc2c1",
    ]
    # bridged / fused ring systems (norbornane, adamantane, decalin,
    # spiro, oxabicyclics): high built-in SAS via the bridged-ring and
    # ring-complexity penalties
    complex_cores = [
        "C1CC2CCC1C2", "C1CC2CCC1CC2", "C1C2CC3CC1CC(C2)C3",
        "C1CCC2CCCCC2C1", "C1CCC2(CC1)CCCC2", "C1CC2CCC1O2",
        "C1CC2CCC1N2", "C1CCC2(CC1)CCNCC2", "C1CC2(CCC1)CC2",
    ]
    simple_chains = [
        "CC", "CCC", "CCCC", "CCO", "CCCO", "CCN", "CCCN", "CCOC",
        "CCOCC", "CCNCC", "CC(C)C", "CCC(C)O", "CCOC(C)=O", "CCCNC",
    ]
    small_rings = ["c1ccccc1", "C1CCCCC1", "c1ccncc1", "C1CCOCC1"]
    subs = [
        "C", "CC", "CCC", "C(C)C", "O", "OC", "OCC", "N", "NC", "N(C)C",
        "F", "Cl", "Br", "C(=O)O", "C(=O)OC", "C(=O)N", "C(=O)NC", "C#N",
        "S(=O)(=O)N", "C(F)(F)F", "CO", "CN", "CCO", "CCN",
    ]
    links = ["", "C", "CC", "O", "N", "C(=O)", "C(=O)N", "OC", "S"]
    # guaranteed-PosIonizable heads: basic sp3 amines need a non-aromatic
    # neighbor (features.py PosIonizable rules exclude N adjacent to
    # aromatic/carbonyl), so every head couples the N to the core through
    # >=1 aliphatic carbon; guanidine/amidine groups count as one feature
    pos_heads = ["NCC", "NCCC", "CNCC", "NC(C)C", "NC(=N)NCC",
                 "NC(=N)CC", "CN(C)CC", "NCCCC"]
    # guaranteed-NegIonizable tails (-> UNKNOWN hypothesis nodes)
    neg_tails = ["CC(=O)O", "CCC(=O)O", "CS(=O)(=O)O", "CCS(=O)(=O)O",
                 "Cc1nnn[nH]1", "CCc1nnn[nH]1"]
    out = set()
    attempts = 0
    while len(out) < n and attempts < 60 * n:
        attempts += 1
        u = rng.random()
        if u < ion_frac:
            # POSC head ... core(s) ... NegIonizable tail: long-span
            # ionizable pairs (sdis ~6-13 between head and tail features)
            s = rng.choice(pos_heads) + rng.choice(cores)
            if rng.random() < 0.6:
                s += rng.choice(links) + rng.choice(cores).replace("1", "2")
            s += rng.choice(neg_tails)
            c = canonical_smiles(s)
            if not c:
                continue
            m = mol_from_smiles(c)
            if m is None or not (8 <= m.n_atoms <= max_atoms):
                continue
            out.add(c)
            continue
        u = (u - ion_frac) / max(1e-9, 1.0 - ion_frac)
        if u < complexity_frac / 2:
            # simple: a chain, optionally with one small ring (low SAS)
            s = rng.choice(simple_chains)
            if rng.random() < 0.5:
                s += rng.choice(small_rings)
                if rng.random() < 0.5:
                    s += rng.choice(subs)
        elif u < complexity_frac:
            # complex: bridged/fused polycyclic core(s) (high SAS)
            s = rng.choice(subs) + rng.choice(complex_cores) + rng.choice(links)
            if rng.random() < 0.5:
                s += rng.choice(complex_cores).translate(
                    str.maketrans("123", "456")
                ) + rng.choice(links)
            s += rng.choice(subs)
        else:
            s = None
        if s is not None:
            c = canonical_smiles(s)
            if not c:
                continue
            m = mol_from_smiles(c)
            if m is None or not (4 <= m.n_atoms <= max_atoms):
                continue
            out.add(c)
            continue
        # head-core-link-tail, optionally with a second core (biaryl-likes)
        s = rng.choice(subs) + rng.choice(cores) + rng.choice(links)
        if rng.random() < long_frac:
            # three-core chain: long-span pharmacophore pairs (sdis 7-13)
            s += rng.choice(cores).replace("1", "2") + rng.choice(links)
            s += rng.choice(cores).replace("1", "3") + rng.choice(links)
        elif rng.random() < 0.35:
            # second ring system: bump its ring-bond digit to keep ids unique
            s += rng.choice(cores).replace("1", "2") + rng.choice(links)
        s += rng.choice(subs)
        c = canonical_smiles(s)
        if not c:
            continue
        m = mol_from_smiles(c)
        if m is None or not (8 <= m.n_atoms <= max_atoms):
            continue
        out.add(c)
    return sorted(out)


def corpus_properties(smiles_list):
    """Real built-in descriptor values for the condition head (the
    reference trains on ChEMBL pickles that carry measured properties,
    train_chembl33_baseline.py:410-421; training with all-zero conditions
    — the pre-round-4 behavior — leaves the condition embedding untrained
    and was why PARITY part B saw no steering)."""
    from cmdgen_tpu.chem.descriptors import all_properties

    props = {k: [] for k in
             ("MW", "logP", "QED", "SAS", "HBA", "HBD", "RotaNumBonds")}
    for s in smiles_list:
        p = all_properties(s) or {}
        for k in props:
            props[k].append(float(p.get(k, 0.0)))
    return props


def gcpg_quality(quick=False, n_corpus=None, epochs=None, workdir=None,
                 eval_only=False, long_frac=0.0, with_properties=True,
                 consensus_noise=0.0,
                 complexity_frac=0.0, ion_frac=0.0):
    from cmdgen_tpu.config import GCPGModelConfig, GCPGTrainConfig
    from cmdgen_tpu.pipeline.evaluate import eval_gcpg
    from cmdgen_tpu.train.gcpg_train import train_gcpg

    corpus = make_corpus(n_corpus or (600 if quick else 8000),
                         long_frac=long_frac,
                         complexity_frac=complexity_frac,
                         ion_frac=ion_frac)
    rng = random.Random(1)
    rng.shuffle(corpus)
    n_test = max(32, len(corpus) // 20)
    test, train = corpus[:n_test], corpus[n_test:]
    train_props = corpus_properties(train) if with_properties else {}

    mcfg = GCPGModelConfig(
        max_len=80,
        hidden_dim=128 if quick else 256,
        n_layers=2 if quick else 6,
        ff_dim=256 if quick else 512,
        n_head=8,
        pp_encoder_n_layer=2 if quick else 3,
        dropout=0.1,
    )
    n_epochs = epochs or (2 if quick else 40)
    tcfg = GCPGTrainConfig(
        batch_size=128, n_epochs=n_epochs, lr=5e-4, cosine_t_max=n_epochs,
        consensus_noise=consensus_noise,
    )
    tmp_ctx = tempfile.TemporaryDirectory() if workdir is None else None
    out_dir = pathlib.Path(workdir or tmp_ctx.name) / "gcpg_ckpt"
    train_s = 0.0
    try:
        if eval_only:
            from cmdgen_tpu.cli import _load_gcpg_ckpt

            model, params, tok = _load_gcpg_ckpt(out_dir, "last")
        else:
            t0 = time.time()
            params, model, tok = train_gcpg(
                mcfg, tcfg, train, train_props, out_dir
            )
            train_s = time.time() - t0
        res = eval_gcpg(
            model, params, tok, jax.random.PRNGKey(3), test,
            n_molecules=32 if quick else 128,
            train_set=set(train), match_workers=4,
        )
    finally:
        if tmp_ctx is not None:
            tmp_ctx.cleanup()
    res = {f"gcpg_{k}": round(float(v), 4) for k, v in res.items()}
    res["gcpg_train_seconds"] = round(train_s, 1)
    res["gcpg_n_train"] = len(train)
    return res


def _type_probs():
    """Pharmacophore type marginals = the reference histogram
    (chem/constants.PHAR_HIST), which is also eval_diffphar's KL target —
    so a perfectly-trained model scores KL ~ 0."""
    from cmdgen_tpu.chem.constants import PHAR_DECODER, PHAR_HIST

    h = np.array([PHAR_HIST[k] for k in PHAR_DECODER], dtype=float)
    return h / h.sum()


def _aa_primary_types():
    """Fixed amino-acid-class -> preferred pharmacophore type map.

    Largest-remainder apportionment of the 20 aa classes to the 8 types by
    the PHAR_HIST marginals, so the aa-conditioned mixture below keeps the
    corpus type marginal at the reference histogram. Deterministic: train
    and test splits (and the trained model) share the same chemistry."""
    probs = _type_probs()
    quota = probs * 20
    counts = np.floor(quota).astype(int)
    rem = quota - counts
    for t in np.argsort(-rem)[: 20 - counts.sum()]:
        counts[t] += 1
    return np.repeat(np.arange(8), counts)


def make_diffphar_dataset(out_dir, n_complexes=600, seed=0,
                          aa_typed=False):
    """Synthetic structured pocket/pharmacophore npz splits: pockets are
    realistic CA shells; pharmacophore points sit at inward-shifted pocket
    anchors with types drawn from a fixed histogram (the distribution the
    type-KL eval measures against).

    ``aa_typed``: condition each point's type on its anchor residue's
    amino-acid class (60% the residue's preferred type from
    ``_aa_primary_types``, 40% the marginal histogram). Real pharmacophore
    types are determined by local pocket chemistry; with iid types the
    model can only learn marginals, sampled clouds carry no type-position
    correlation, and the per-family-normalized consensus vote
    (get_phar.py:_cluster_feature_types, reference GMM_json.py semantics)
    amplifies scattered rare families into UNKNOWN/POSC hypothesis nodes
    no drug-like molecule can realize (measured corpus-vs-hypothesis match
    ceiling 0.4-0.67). aa-conditioning restores the learnable structure
    the reference's real data has; marginals stay at PHAR_HIST."""
    from cmdgen_tpu.data.crossdocked import write_split_npz
    from cmdgen_tpu.utils.synthetic import realistic_ca_pocket

    rng = np.random.RandomState(seed)
    type_probs = _type_probs()
    aa_primary = _aa_primary_types()
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    splits = {"train": int(n_complexes * 0.9),
              "val": max(8, int(n_complexes * 0.05)),
              "test": max(8, int(n_complexes * 0.05))}
    sizes = []
    idx = 0
    for split, count in splits.items():
        complexes, names = [], []
        for _ in range(count):
            n_q = rng.randint(90, 128)
            # r_lo=5: real pockets have CAs from ~5 A of the site center,
            # so the reverse chain's CoM-centered init is never far outside
            # the message-passing cutoff of the nearest pocket atoms
            pocket = realistic_ca_pocket(
                np.random.RandomState(idx), n_q, r_lo=5.0, r_hi=13.0
            )
            n_p = rng.randint(3, 9)
            anchor_idx = rng.choice(n_q, n_p, replace=False)
            anchors = pocket[anchor_idx]
            aa_ids = rng.randint(0, 20, n_q)
            # contact distance: each point ~3.5 A inward of its anchor CA,
            # i.e. INSIDE the 6 A message-passing cutoff — with points
            # beyond the cutoff the denoiser is disconnected from the
            # pocket and the coordinate channel cannot learn (verified
            # with an oracle eps-model: the sampler itself is exact)
            inward = -anchors / (
                np.linalg.norm(anchors, axis=1, keepdims=True) + 1e-9
            )
            phar = anchors + inward * 3.5 + rng.randn(n_p, 3) * 0.5
            if aa_typed:
                types = np.where(
                    rng.random_sample(n_p) < 0.6,
                    aa_primary[aa_ids[anchor_idx]],
                    rng.choice(8, n_p, p=type_probs),
                )
            else:
                types = rng.choice(8, n_p, p=type_probs)
            joint = np.concatenate([phar, pocket])
            com = joint.mean(0, keepdims=True)
            complexes.append({
                "phar_coords": (phar - com).astype(np.float32),
                "phar_one_hot": np.eye(8, dtype=np.float32)[types],
                "pocket_c_alpha": (pocket - com).astype(np.float32),
                "pocket_one_hot": np.eye(20, dtype=np.float32)[aa_ids],
            })
            names.append(f"synth_{idx}")
            sizes.append((n_p, n_q))
            idx += 1
        write_split_npz(out_dir / f"{split}.npz", names, complexes)
    # joint size histogram (n_phar x n_pocket), as preprocessing writes
    n_max_p = max(s[0] for s in sizes) + 1
    n_max_q = max(s[1] for s in sizes) + 1
    hist = np.zeros((n_max_p, n_max_q))
    for p, q in sizes:
        hist[p, q] += 1
    np.save(out_dir / "size_distribution.npy", hist / hist.sum())
    return out_dir


def diffphar_quality(quick=False, epochs=None, n_complexes=None,
                     neighbor_k=None, steps_per_call=1, ckpt_epochs=1,
                     ema_decay=0.0, stratified_t=False, hidden=None,
                     n_layers=None, batch_size=16, lr=3e-4,
                     workdir=None, eval_only=False, eval_pockets=None,
                     ckpt_name="last", val_epochs=1,
                     eval_clamp_x=None, eval_timesteps=None,
                     aa_typed=False, resume=False, train_timesteps=None,
                     eval_ddim_eta=None):
    """Train (or reload from ``workdir``) the conditional DDPM on the
    synthetic structured corpus and run the reference eval suite.

    ``workdir`` persists the dataset + checkpoints across invocations so a
    long run can be monitored / re-evaluated (``eval_only=True``)."""
    from cmdgen_tpu import config as cfgmod
    from cmdgen_tpu.data.dataset import DiffPharDataset
    from cmdgen_tpu.models.egnn import EGNNConfig
    from cmdgen_tpu.pipeline.evaluate import eval_diffphar
    from cmdgen_tpu.train import state as tstate
    from cmdgen_tpu.train.diffphar_train import train_diffphar

    cfg = cfgmod.ca_config()
    cfg = dataclasses.replace(
        cfg,
        dynamics=dataclasses.replace(
            cfg.dynamics,
            egnn=EGNNConfig(
                hidden_nf=hidden or (64 if quick else 128),
                n_layers=n_layers or (1 if quick else 3),
                inv_sublayers=1,
                neighbor_k=neighbor_k,
            ),
        ),
        ddpm=dataclasses.replace(
            cfg.ddpm,
            timesteps=train_timesteps or (20 if quick else 100),
            stratified_t=stratified_t,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=batch_size,
            n_epochs=epochs or (2 if quick else 40),
            lr=lr, clip_grad=True, steps_per_call=steps_per_call,
            ckpt_epochs=ckpt_epochs, ema_decay=ema_decay,
            val_epochs=val_epochs, eval_epochs=max(25, val_epochs),
        ),
    )
    tmp_ctx = tempfile.TemporaryDirectory() if workdir is None else None
    root = pathlib.Path(workdir or tmp_ctx.name)
    try:
        data = root / "data"
        if not (data / "train.npz").exists():
            make_diffphar_dataset(
                data, n_complexes or (60 if quick else 600),
                aa_typed=aa_typed,
            )
        train_s = 0.0
        if eval_only:
            from cmdgen_tpu.train import checkpoint as ckptmod
            payload, meta = ckptmod.load_checkpoint(root / "ckpt", ckpt_name)
            params = ckptmod.eval_params_from_payload(payload)
            cfg = cfgmod.from_dict(cfgmod.DiffPharConfig, meta["config"])
            if eval_clamp_x:
                cfg = dataclasses.replace(
                    cfg, ddpm=dataclasses.replace(
                        cfg.ddpm, clamp_x=eval_clamp_x
                    ),
                )
            if eval_ddim_eta is not None:
                cfg = dataclasses.replace(
                    cfg, ddpm=dataclasses.replace(
                        cfg.ddpm, ddim_eta=eval_ddim_eta
                    ),
                )
            from cmdgen_tpu.train.diffphar_train import build_model
            model = build_model(cfg)
        else:
            from cmdgen_tpu.utils.logging import MetricsLogger

            logger = MetricsLogger(root / "ckpt", "quality_diffphar")
            t0 = time.time()
            state, model = train_diffphar(
                cfg, data, root / "ckpt", log_fn=logger.log,
                resume_from=(root / "ckpt") if resume
                and (root / "ckpt" / "last.json").exists() else None,
            )
            params = tstate.eval_params(state)
            train_s = time.time() - t0
        test_ds = DiffPharDataset(data / "test.npz")
        res = eval_diffphar(
            model, params, jax.random.PRNGKey(9), test_ds,
            n_pockets=eval_pockets or (4 if quick else 16),
            n_samples_per_pocket=4, timesteps=eval_timesteps,
        )
    finally:
        if tmp_ctx is not None:
            tmp_ctx.cleanup()
    out = {f"diffphar_{k}": round(float(v), 4) for k, v in res.items()}
    out["diffphar_train_seconds"] = round(train_s, 1)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-diffphar", action="store_true")
    ap.add_argument("--skip-gcpg", action="store_true")
    ap.add_argument("--diffphar-epochs", type=int, default=None)
    ap.add_argument("--gcpg-corpus", type=int, default=None)
    ap.add_argument("--gcpg-epochs", type=int, default=None)
    ap.add_argument("--gcpg-long-frac", type=float, default=0.0,
                    help="fraction of three-core (long-span) corpus "
                         "molecules; covers the sdis 7-13 conditioning "
                         "range of DiffPhar-consensus hypotheses")
    ap.add_argument("--gcpg-complexity-frac", type=float, default=0.0,
                    help="fraction of corpus molecules built at the two "
                         "synthesizability extremes (half simple chains, "
                         "half bridged polycyclics) so the SAS/MW/logP "
                         "condition support is wide")
    ap.add_argument("--gcpg-consensus-noise", type=float, default=0.0,
                    help="fraction of training pp-graphs re-drawn consensus-"
                         "style (decode-time size prior + distance jitter)")
    ap.add_argument("--gcpg-ion-frac", type=float, default=0.0,
                    help="fraction of corpus molecules built as long-span "
                         "ionizable chains (guaranteed PosIonizable head + "
                         "NegIonizable tail) so POSC/UNKNOWN consensus "
                         "hypothesis nodes are corpus-attainable")
    ap.add_argument("--diffphar-complexes", type=int, default=None)
    ap.add_argument("--diffphar-neighbor-k", type=int, default=None)
    ap.add_argument("--diffphar-steps-per-call", type=int, default=1)
    ap.add_argument("--diffphar-ckpt-epochs", type=int, default=1)
    ap.add_argument("--diffphar-ema", type=float, default=0.0)
    ap.add_argument("--diffphar-stratified-t", action="store_true")
    ap.add_argument("--diffphar-hidden", type=int, default=None)
    ap.add_argument("--diffphar-layers", type=int, default=None)
    ap.add_argument("--diffphar-batch", type=int, default=16)
    ap.add_argument("--diffphar-lr", type=float, default=3e-4)
    ap.add_argument("--workdir", default=None,
                    help="persist dataset+checkpoints here (enables "
                         "--eval-only re-evaluation of a finished run)")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--eval-pockets", type=int, default=None)
    ap.add_argument("--ckpt-name", default="last")
    ap.add_argument("--diffphar-val-epochs", type=int, default=1)
    ap.add_argument("--diffphar-resume", action="store_true",
                    help="resume training from workdir/ckpt 'last' "
                         "(params+opt_state+EMA; covered epochs skipped)")
    ap.add_argument("--diffphar-aa-typed", action="store_true",
                    help="aa-conditioned pharmacophore types in the "
                         "synthetic corpus (type-position correlation, "
                         "see make_diffphar_dataset)")
    ap.add_argument("--eval-clamp-x", type=float, default=None,
                    help="static coordinate thresholding during eval "
                         "sampling (Å; opt-in stabilization knob)")
    ap.add_argument("--eval-timesteps", type=int, default=None,
                    help="respaced reverse-chain steps for eval sampling")
    ap.add_argument("--eval-ddim-eta", type=float, default=None,
                    help="DDIM sampling at this eta during eval "
                         "(0 = deterministic; None = ancestral DDPM)")
    ap.add_argument("--diffphar-timesteps", type=int, default=None,
                    help="training diffusion chain length T (default 100; "
                         "the reference trains at 500 — longer chains "
                         "shrink the per-step 1/alpha error amplification "
                         "in the reverse chain at identical training cost)")
    args = ap.parse_args()
    out = {}
    if not args.skip_diffphar:
        out.update(diffphar_quality(
            args.quick, epochs=args.diffphar_epochs,
            n_complexes=args.diffphar_complexes,
            neighbor_k=args.diffphar_neighbor_k,
            steps_per_call=args.diffphar_steps_per_call,
            ckpt_epochs=args.diffphar_ckpt_epochs,
            ema_decay=args.diffphar_ema,
            stratified_t=args.diffphar_stratified_t,
            hidden=args.diffphar_hidden, n_layers=args.diffphar_layers,
            batch_size=args.diffphar_batch, lr=args.diffphar_lr,
            workdir=args.workdir, eval_only=args.eval_only,
            eval_pockets=args.eval_pockets, ckpt_name=args.ckpt_name,
            val_epochs=args.diffphar_val_epochs,
            eval_clamp_x=args.eval_clamp_x,
            eval_timesteps=args.eval_timesteps,
            eval_ddim_eta=args.eval_ddim_eta,
            aa_typed=args.diffphar_aa_typed,
            resume=args.diffphar_resume,
            train_timesteps=args.diffphar_timesteps,
        ))
        print("# diffphar done:", json.dumps(out))
    if not args.skip_gcpg:
        out.update(gcpg_quality(
            args.quick, n_corpus=args.gcpg_corpus, epochs=args.gcpg_epochs,
            workdir=args.workdir, eval_only=args.eval_only,
            long_frac=args.gcpg_long_frac,
            complexity_frac=args.gcpg_complexity_frac,
            ion_frac=args.gcpg_ion_frac,
            consensus_noise=args.gcpg_consensus_noise,
        ))
    print(json.dumps(out))
