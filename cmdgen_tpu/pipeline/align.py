"""PharAlign: embed generated molecules and align them onto the pharmacophore.

Behavioral equivalent of PharAlign/align_test_wrn.py:23-540 (+
align_ligandpharm_* variants): for each generated SMILES and each
tolerance-k subset of the pharmacophore points, match molecule features to
the points, embed conformers (distance geometry with pharmacophore
constraints — ops/dgeom.py replaces RDKit EmbedPharmacophore), align the
matched feature centroids onto the point coordinates with Kabsch (replacing
rdAlignment.GetAlignmentTransform), and keep the best conformers by RMSD,
writing posed SDF files.
"""
from __future__ import annotations

import itertools
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem.features import GCPG_MAPPING, get_features
from cmdgen_tpu.chem.mol import Mol, mol_from_smiles
from cmdgen_tpu.chem.sdf import write_sdf
from cmdgen_tpu.ops.dgeom import embed_conformers
from cmdgen_tpu.ops.kabsch import apply_rigid, kabsch, rmsd

# posp code -> GCPG 1-based family index (shared with match scoring)
_POSP2GCPG = {
    "AROM": 1, "HYBL": 2, "POSC": 3, "HACC": 4, "HDON": 5, "LHYBL": 6,
    "UNKNOWN": 7,
}


def load_pp_points(posp_path) -> Tuple[np.ndarray, List[str]]:
    """.posp -> (coords [K,3], type codes)."""
    coords, types = [], []
    for line in Path(posp_path).read_text().strip().split("\n"):
        parts = line.strip().split()
        types.append(parts[0])
        coords.append([float(v) for v in parts[-3:]])
    return np.asarray(coords, dtype=np.float32), types


def generate_subsets_with_tolerance(k: int, tolerance: int):
    """Index subsets dropping up to ``tolerance`` points
    (align_test_wrn.py:340-347), largest subsets first."""
    out = []
    for drop in range(0, tolerance + 1):
        if k - drop < 2:
            break
        for keep in itertools.combinations(range(k), k - drop):
            out.append(list(keep))
    return out


def match_features_to_points(
    mol: Mol, point_types: Sequence[str]
) -> Optional[List[Tuple[int, ...]]]:
    """Greedy assignment of one perceived feature atom-set per point.

    Returns atom groups (one per point) or None if some point has no
    candidate (the reference's MatchPharmacophoreToMol failure path).
    """
    feats = get_features(mol) or []
    by_idx: Dict[int, List[Tuple[int, ...]]] = {}
    for fam, atoms in feats:
        by_idx.setdefault(GCPG_MAPPING.get(fam, 7), []).append(atoms)
    chosen: List[Tuple[int, ...]] = []
    used: set = set()
    for t in point_types:
        idx = _POSP2GCPG.get(t, 7)
        cands = by_idx.get(idx, [])
        pick = None
        for c in cands:
            if c not in used:
                pick = c
                break
        if pick is None:
            if cands:
                pick = cands[0]  # allow reuse rather than failing outright
            else:
                return None
        used.add(pick)
        chosen.append(pick)
    # a rigid alignment needs at least two geometrically distinct anchors;
    # e.g. AROM + LHYBL of the same ring share a centroid and degenerate
    if len(set(chosen)) < 2:
        return None
    return chosen


def align_molecule(
    smiles: str,
    pp_coords: np.ndarray,
    pp_types: Sequence[str],
    rng: jax.Array,
    n_conformers: int = 10,
    num_keep: int = 3,
    tolerance: int = 0,
    refine_steps: int = 200,
):
    """Embed + align one molecule (a SMILES string or an already-built
    chem Mol, e.g. a PDB-pose ligand with perceived bonds). Returns list of
    (rmsd, conformer coords aligned into the pharmacophore frame, kept point
    indices) sorted by RMSD, or None if the molecule can't be matched."""
    mol = mol_from_smiles(smiles) if isinstance(smiles, str) else smiles
    if mol is None:
        return None
    results = []
    for keep in generate_subsets_with_tolerance(len(pp_types), tolerance):
        sub_coords = pp_coords[keep]
        sub_types = [pp_types[i] for i in keep]
        groups = match_features_to_points(mol, sub_types)
        if groups is None:
            continue
        targets = np.sqrt(
            ((sub_coords[:, None, :] - sub_coords[None, :, :]) ** 2).sum(-1)
        )
        rng, sub = jax.random.split(rng)
        confs = embed_conformers(
            mol, n_conformers, sub,
            refine_steps=refine_steps,
            centroid_groups=groups,
            centroid_targets=targets,
            centroid_weight=2.0,
        )  # [C, N, 3]
        confs = np.asarray(confs)
        # per conformer: centroids of matched groups -> Kabsch onto points
        gm = np.zeros((len(groups), mol.n_atoms), dtype=np.float32)
        for k, atoms in enumerate(groups):
            for a in atoms:
                gm[k, a] = 1.0 / len(atoms)
        cents = np.einsum("gn,cnd->cgd", gm, confs)
        for c in range(confs.shape[0]):
            r, t = kabsch(jnp.asarray(cents[c]), jnp.asarray(sub_coords))
            aligned_cents = np.asarray(
                apply_rigid(r, t, jnp.asarray(cents[c]))
            )
            e = float(
                np.sqrt(((aligned_cents - sub_coords) ** 2).sum(-1).mean())
            )
            aligned_conf = np.asarray(apply_rigid(r, t, jnp.asarray(confs[c])))
            results.append((e, aligned_conf, list(keep)))
        if results:
            break  # reference keeps the largest matchable subset
    if not results:
        return None
    results.sort(key=lambda x: x[0])
    return results[:num_keep]


def prepare_align_entries(
    smiles_list: Sequence[str], pp_types: Sequence[str]
) -> List[Tuple[int, Mol, List[Tuple[int, ...]]]]:
    """Host half of batched alignment: parse each SMILES and match its
    perceived features to the pharmacophore point types. Returns
    [(index, mol, atom groups)] for the molecules that matched — pure
    Python, safe to run on a worker thread while the device aligns the
    previous batch."""
    entries = []
    for i, s in enumerate(smiles_list):
        mol = mol_from_smiles(s) if isinstance(s, str) else s
        if mol is None:
            continue
        groups = match_features_to_points(mol, pp_types)
        if groups is None:
            continue
        entries.append((i, mol, groups))
    return entries


def align_entries(
    entries: Sequence[Tuple[int, Mol, List[Tuple[int, ...]]]],
    pp_coords: np.ndarray,
    rng: jax.Array,
    n_conformers: int = 10,
    num_keep: int = 3,
    refine_steps: int = 200,
    bucket: int = 16,
) -> Dict[int, list]:
    """Device half of batched alignment: embed + Kabsch the prepared
    entries (one jit call per size bucket).

    Returns {index: [(rmsd, aligned conformer coords [n_atoms,3]), ...]}.
    """
    from cmdgen_tpu.ops.dgeom import embed_conformers_padded, padded_bounds

    k = pp_coords.shape[0]
    targets_full = np.sqrt(
        ((pp_coords[:, None, :] - pp_coords[None, :, :]) ** 2).sum(-1)
    ).astype(np.float32)

    results: Dict[int, list] = {}
    if not entries:
        return results

    # bucket by padded size
    buckets: Dict[int, list] = {}
    for e in entries:
        n_pad = -(-e[1].n_atoms // bucket) * bucket
        buckets.setdefault(n_pad, []).append(e)

    for n_pad, ents in buckets.items():
        mols = [e[1] for e in ents]
        lo, up, amask = padded_bounds(mols, n_pad)
        m = len(mols)
        gmat = np.zeros((m, k, n_pad), dtype=np.float32)
        for mi, (_, mol, groups) in enumerate(ents):
            for gi, atoms in enumerate(groups):
                for a in atoms:
                    gmat[mi, gi, a] = 1.0 / len(atoms)
        rng, sub = jax.random.split(rng)
        confs = embed_conformers_padded(
            jnp.asarray(lo), jnp.asarray(up), jnp.asarray(amask),
            n_conformers, sub, refine_steps=refine_steps,
            groups=jnp.asarray(gmat),
            targets=jnp.broadcast_to(jnp.asarray(targets_full), (m, k, k)),
            group_mask=jnp.ones((m, k)),
            centroid_weight=2.0,
        )  # [M, C, Nb, 3]
        confs = np.asarray(confs)
        # batched Kabsch of feature centroids onto the pharmacophore
        cents = np.einsum("mgn,mcnd->mcgd", gmat, confs)  # [M, C, K, 3]
        flat = jnp.asarray(cents.reshape(m * n_conformers, k, 3))
        tgt = jnp.broadcast_to(
            jnp.asarray(pp_coords), (m * n_conformers, k, 3)
        )
        rs, ts = jax.vmap(kabsch)(flat, tgt)
        aligned_cents = np.asarray(jax.vmap(apply_rigid)(rs, ts, flat))
        # float64: squared errors of a diverged embedding (unattainable
        # target distances) overflow float32; non-finite conformers are
        # dropped below rather than reported as inf/nan RMSDs
        errs = np.sqrt(
            ((aligned_cents.astype(np.float64)
              - np.asarray(tgt, dtype=np.float64)) ** 2).sum(-1).mean(-1)
        ).reshape(m, n_conformers)
        rs = np.asarray(rs).reshape(m, n_conformers, 3, 3)
        ts = np.asarray(ts).reshape(m, n_conformers, 3)
        for mi, (idx, mol, _) in enumerate(ents):
            # a diverged DG embedding can also come back finite-but-huge
            # (1e8+ Å); anything past 1e3 is unambiguous garbage, not a
            # pose — drop it with the non-finite ones
            finite = np.isfinite(errs[mi]) & (errs[mi] < 1e3)
            if not finite.any():
                continue
            order = np.argsort(np.where(finite, errs[mi], np.inf))[:num_keep]
            res = []
            for c in order:
                if not finite[c]:
                    continue
                coords = confs[mi, c, : mol.n_atoms] @ rs[mi, c].T + ts[mi, c]
                res.append((float(errs[mi, c]), coords))
            results[idx] = res
    return results


def align_batch(
    smiles_list: Sequence[str],
    pp_coords: np.ndarray,
    pp_types: Sequence[str],
    rng: jax.Array,
    n_conformers: int = 10,
    num_keep: int = 3,
    refine_steps: int = 200,
    bucket: int = 16,
):
    """Batched alignment: all molecules of a size bucket embed in ONE jit
    call (ops/dgeom.py:embed_conformers_padded) — the per-molecule path
    recompiles for every atom count and was the pipeline bottleneck.

    Returns {index: [(rmsd, aligned conformer coords [n_atoms,3]), ...]}.
    """
    entries = prepare_align_entries(smiles_list, pp_types)
    return align_entries(
        entries, np.asarray(pp_coords, dtype=np.float32), rng,
        n_conformers=n_conformers, num_keep=num_keep,
        refine_steps=refine_steps, bucket=bucket,
    )


def align_smiles_list(
    smiles_list: Sequence[str],
    posp_path,
    out_dir,
    rng: Optional[jax.Array] = None,
    n_conformers: int = 10,
    num_keep: int = 3,
    tolerance: int = 0,
) -> Dict[str, float]:
    """Stage-4 CLI body (align.sh -> align_test_wrn.py): aligned SDFs +
    rmsd_values.npy. Returns {smiles: best rmsd}. Uses the batched
    embedding path; ``tolerance`` retries unmatched molecules on point
    subsets (align_test_wrn.py:340-347)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    pp_coords, pp_types = load_pp_points(posp_path)

    rng, sub = jax.random.split(rng)
    results = align_batch(
        smiles_list, pp_coords, pp_types, sub,
        n_conformers=n_conformers, num_keep=num_keep,
    )
    # tolerance fallback: retry unmatched molecules on reduced subsets
    if tolerance > 0:
        missing = [i for i in range(len(smiles_list)) if i not in results]
        for keep in generate_subsets_with_tolerance(len(pp_types), tolerance):
            if len(keep) == len(pp_types) or not missing:
                continue
            rng, sub = jax.random.split(rng)
            part = align_batch(
                [smiles_list[i] for i in missing],
                pp_coords[keep], [pp_types[i] for i in keep], sub,
                n_conformers=n_conformers, num_keep=num_keep,
            )
            for local_i, res in part.items():
                results[missing[local_i]] = res
            missing = [i for i in missing if i not in results]

    best: Dict[str, float] = {}
    rmsds = []
    for i, res in sorted(results.items()):
        smiles = smiles_list[i]
        mol = mol_from_smiles(smiles)
        symbols = [a.symbol for a in mol.atoms]
        bonds = [(b.a1, b.a2, b.order) for b in mol.bonds]
        mols = [
            (symbols, coords, f"{smiles} rmsd={e:.3f}") for e, coords in res
        ]
        write_sdf(
            out_dir / f"mol_{i}.sdf", mols, bonds_list=[bonds] * len(mols)
        )
        best[smiles] = res[0][0]
        rmsds.append(res[0][0])
    np.save(out_dir / "rmsd_values.npy", np.asarray(rmsds, dtype=np.float32))
    return best
