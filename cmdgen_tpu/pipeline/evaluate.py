"""Scientific evaluation harnesses.

Equivalents of the reference's evaluation CLIs:
- eval_diffphar: DiffPhar/test.py:34-227 — sample pharmacophore clouds per
  test pocket and compare against the reference pharmacophores (CoM distance
  to the reference centroid, max pairwise spread, per-type histograms + KL).
- eval_gcpg: GCPG/test_generation.py:87-269 — generate SMILES for test
  pharmacophore graphs and score match / validity / uniqueness / novelty.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem import metrics as qmetrics
from cmdgen_tpu.chem.constants import PHAR_DECODER, PHAR_HIST
from cmdgen_tpu.chem.match import get_match_scores
from cmdgen_tpu.chem.ppgraph import smiles_to_ppgraph
from cmdgen_tpu.containers import PointCloud
from cmdgen_tpu.data.dataset import DiffPharDataset


def eval_diffphar(
    model,
    params,
    rng,
    dataset: DiffPharDataset,
    n_pockets: int = 20,
    n_samples_per_pocket: int = 4,
    timesteps: int = None,
) -> Dict[str, float]:
    """Distribution-match eval (test.py). Returns summary metrics."""
    com_dists: List[float] = []
    spreads_gen: List[float] = []
    spreads_ref: List[float] = []
    type_hist = np.zeros(len(PHAR_DECODER))
    n_pockets = min(n_pockets, len(dataset))
    for i in range(n_pockets):
        batch = dataset.padded_batch([i] * n_samples_per_pocket)
        pocket = PointCloud(
            x=jnp.asarray(batch["pocket_x"]),
            h=jnp.asarray(batch["pocket_h"]),
            mask=jnp.asarray(batch["pocket_mask"]),
        )
        ref_x = batch["phar_x"][0]
        ref_mask = batch["phar_mask"][0] > 0.5
        ref_pts = ref_x[ref_mask]
        n_ref = int(ref_mask.sum())
        rng, sub = jax.random.split(rng)
        out, _ = model.sample_given_pocket(
            params, sub, pocket,
            jnp.full((n_samples_per_pocket,), n_ref),
            dataset.n_phar_max, timesteps=timesteps,
        )
        x = np.asarray(out.x)
        h = np.asarray(out.h)
        m = np.asarray(out.mask) > 0.5
        ref_com = ref_pts.mean(axis=0)
        for s in range(n_samples_per_pocket):
            pts = x[s][m[s]]
            if len(pts) == 0:
                continue
            com_dists.append(float(np.linalg.norm(pts.mean(0) - ref_com)))
            if len(pts) > 1:
                d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
                spreads_gen.append(float(d.max()))
            types = h[s][m[s]].argmax(-1)
            for t in types:
                type_hist[int(t)] += 1
        if n_ref > 1:
            d = np.sqrt(((ref_pts[:, None] - ref_pts[None]) ** 2).sum(-1))
            spreads_ref.append(float(d.max()))
    ref_hist = np.asarray([PHAR_HIST[k] for k in PHAR_DECODER], dtype=float)
    return {
        "com_dist_mean": float(np.mean(com_dists)) if com_dists else np.nan,
        "spread_gen_mean": float(np.mean(spreads_gen)) if spreads_gen else np.nan,
        "spread_ref_mean": float(np.mean(spreads_ref)) if spreads_ref else np.nan,
        "kl_types": qmetrics.categorical_kl(type_hist, ref_hist),
        "n_sampled": int(sum(type_hist)),
    }


def eval_alignment_rmsd(
    smiles_list: Sequence[str],
    reference_coords: Sequence[np.ndarray],
    posp_path,
    rng=None,
    n_conformers: int = 10,
) -> Dict[str, float]:
    """Aligned-conformer vs reference-pose RMSD
    (PharAlign/align_ligandpharm_gcpg_test.py:339-562): align each molecule
    onto the pharmacophore, then report the minimum heavy-atom RMSD between
    the aligned conformers and the molecule's reference pose coordinates."""
    import jax

    from cmdgen_tpu.ops.kabsch import aligned_rmsd
    from cmdgen_tpu.pipeline.align import align_batch, load_pp_points

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    pp_coords, pp_types = load_pp_points(posp_path)
    results = align_batch(
        smiles_list, pp_coords, pp_types, rng, n_conformers=n_conformers,
        num_keep=n_conformers,
    )
    rmsds = []
    for i, res in results.items():
        ref = np.asarray(reference_coords[i], dtype=np.float32)
        best = np.inf
        for _, conf in res:
            if conf.shape != ref.shape:
                continue
            r = float(aligned_rmsd(jnp.asarray(conf), jnp.asarray(ref)))
            best = min(best, r)
        if np.isfinite(best):
            rmsds.append(best)
    return {
        "rmsd_mean": float(np.mean(rmsds)) if rmsds else float("nan"),
        "rmsd_median": float(np.median(rmsds)) if rmsds else float("nan"),
        "n_aligned": len(rmsds),
        "rmsd_values": rmsds,
    }


def eval_alignment_rmsd_posed(
    pose_pdb_paths: Sequence,
    posp_path,
    ref_ligand: Optional[str] = None,
    rng=None,
    n_conformers: int = 10,
    tolerance: int = 1,
    out_dir=None,
) -> Dict[str, float]:
    """Posed-PDB-ligand RMSD evaluation
    (PharAlign/align_ligandpharm_gcpg_test.py:339-562): parse each
    docked-pose PDB ligand, re-embed + align it onto the pharmacophore with
    tolerance subsets, and report the minimum heavy-atom RMSD between the
    aligned conformers and the reference pose. Writes ``rmsd_values.npy``
    (only the finite values, L539-547) when ``out_dir`` is given.

    Deviations from the reference, documented:
    - bond perception uses the library-free OpenBabel-equivalent path
      (chem/mol_build.py build_molecule: covalent-radius connectivity +
      valence-gated order perception) instead of Chem.MolFromPDBFile —
      both are distance-based proximity perception on the pose geometry;
    - the RMSD compares the aligned conformer against the *actual pose
      coordinates* after Kabsch superposition. The reference re-embeds BOTH
      molecules with fresh RDKit conformers and subtracts them without
      superposition (generate_coords_np L344-351) — a quirk whose output is
      dominated by the arbitrary embedding frames; we do not replicate it.
    """
    import jax

    from cmdgen_tpu.chem.mol_build import build_molecule
    from cmdgen_tpu.chem.pdb import ligand_atoms, parse_pdb
    from cmdgen_tpu.ops.kabsch import aligned_rmsd
    from cmdgen_tpu.pipeline.align import align_molecule, load_pp_points

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    pp_coords, pp_types = load_pp_points(posp_path)
    rmsds = []
    n_failed = 0
    for path in pose_pdb_paths:
        try:
            residues = parse_pdb(path)
            if ref_ligand is not None:
                atoms = ligand_atoms(residues, ref_ligand)
            else:
                # a pose file usually holds just the ligand: all heavy atoms
                atoms = [
                    a
                    for r in residues
                    for a in r.atoms
                    if a.element != "H" and r.res_name != "HOH"
                ]
            if not atoms:
                raise ValueError(f"no ligand atoms in {path}")
            symbols = [a.element for a in atoms]
            pose = np.stack([a.coord for a in atoms])
            mol = build_molecule(symbols, pose)
            rng, sub = jax.random.split(rng)
            res = align_molecule(
                mol, pp_coords, pp_types, sub,
                n_conformers=n_conformers, num_keep=n_conformers,
                tolerance=tolerance,
            )
            if not res:
                raise ValueError("no alignment")
            best = min(
                float(aligned_rmsd(jnp.asarray(conf), jnp.asarray(pose)))
                for _, conf, _ in res
            )
            rmsds.append(best)
        except Exception:
            n_failed += 1  # per-molecule try/except-and-skip, as the reference
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        if rmsds:
            np.save(out_dir / "rmsd_values.npy", np.asarray(rmsds, np.float32))
    return {
        "rmsd_mean": float(np.mean(rmsds)) if rmsds else float("nan"),
        "rmsd_median": float(np.median(rmsds)) if rmsds else float("nan"),
        "n_aligned": len(rmsds),
        "n_failed": n_failed,
        "rmsd_values": rmsds,
    }


def eval_gcpg(
    model,
    params,
    tokenizer,
    rng,
    test_smiles: Sequence[str],
    n_molecules: int = 100,
    conditions: Optional[np.ndarray] = None,
    train_set: Optional[set] = None,
    match_workers: int = 4,
) -> Dict[str, float]:
    """Generation eval on test pharmacophores (test_generation.py)."""
    from cmdgen_tpu.models import gcpg as gcpg_mod

    import random as _random

    py_rng = _random.Random(0)
    graphs, used = [], []
    for s in test_smiles:
        if len(graphs) >= n_molecules:
            break
        g = smiles_to_ppgraph(s, py_rng)
        if g is not None:
            graphs.append(g[:3])
            used.append(s)
    if not graphs:
        return {"n_eval": 0}
    pp_h = jnp.asarray(np.stack([g[0] for g in graphs]))
    pp_e = jnp.asarray(np.stack([g[1] for g in graphs]))
    pp_mask = jnp.asarray(np.stack([g[2] for g in graphs]))
    b = pp_h.shape[0]
    if conditions is None:
        # the reference conditions on each test molecule's TRUE properties
        # (test_generation.py:132-136: the SemiSmilesDataset batch carries
        # the pickle's measured values); generate.py's fixed grid defaults
        # are the fallback for molecules the descriptors reject
        from cmdgen_tpu.chem.descriptors import all_properties

        default = [400.0, 4.0, 0.6, 4.0, 4.0, 0.0, 0.0]
        rows = []
        for s in used:
            p = all_properties(s)
            rows.append(
                [p["MW"], p["logP"], p["QED"], p["SAS"], p["RotaNumBonds"],
                 0.0, 0.0] if p else default
            )
        conditions = np.asarray(rows, dtype=np.float32)
    rng, sub = jax.random.split(rng)
    toks = gcpg_mod.generate(
        model, params, sub, pp_h, pp_e, pp_mask,
        jnp.asarray(conditions), random_sample=True,
    )
    smiles_out = tokenizer.get_text(np.asarray(toks))
    out = qmetrics.evaluate_set(smiles_out, train_set=train_set)
    scores = get_match_scores(
        [tuple(np.asarray(a) for a in g) for g in graphs],
        smiles_out, n_workers=match_workers, timeout=20,
    )
    valid_scores = [s for s in scores if s >= 0]
    out["match_score"] = float(np.mean(valid_scores)) if valid_scores else -1.0
    out["match_timeout_rate"] = float(np.mean([s == -2 for s in scores]))
    out["n_eval"] = len(smiles_out)
    return out
