"""Distance-geometry embedding + pharmacophore alignment."""
import jax
import numpy as np
import pytest

from cmdgen_tpu.chem.mol import mol_from_smiles
from cmdgen_tpu.ops.dgeom import bounds_matrix, bounds_violation, embed_conformers
from cmdgen_tpu.pipeline import align as al


def test_bounds_matrix_sane():
    mol = mol_from_smiles("CCO")
    lower, upper = bounds_matrix(mol)
    # C-C bond ~1.52, C-O ~1.42
    assert 1.4 < lower[0, 1] < 1.6 and 1.4 < upper[0, 1] < 1.6
    assert 1.3 < lower[1, 2] < 1.5
    # 1-3 distance ~2.4
    assert 2.2 < lower[0, 2] < 2.6
    assert (upper + 1e-9 >= lower).all()


def test_embedding_respects_bonds():
    mol = mol_from_smiles("CC(=O)Oc1ccccc1")
    confs = np.asarray(
        embed_conformers(mol, 4, jax.random.PRNGKey(0), refine_steps=300)
    )
    assert confs.shape == (4, mol.n_atoms, 3)
    # bond lengths close to target
    for b in mol.bonds:
        d = np.linalg.norm(confs[0, b.a1] - confs[0, b.a2])
        assert 1.0 < d < 1.9, (b, d)
    assert bounds_violation(mol, confs[0]) < 0.3


def test_subsets_with_tolerance():
    subs = al.generate_subsets_with_tolerance(4, 1)
    assert [0, 1, 2, 3] in subs
    assert len([s for s in subs if len(s) == 3]) == 4


def test_align_molecule_to_own_features():
    """Build a pharmacophore from an embedded conformer of the molecule
    itself; alignment should find a low-RMSD pose."""
    smiles = "CCOc1ccccc1"  # ether O acceptor + aromatic ring + ethyl
    mol = mol_from_smiles(smiles)
    conf = np.asarray(
        embed_conformers(mol, 1, jax.random.PRNGKey(1), refine_steps=400)
    )[0]
    from cmdgen_tpu.chem.features import get_features

    feats = get_features(mol)
    arom = next(a for f, a in feats if f == "Aromatic")
    acc = next(a for f, a in feats if f == "Acceptor")
    pp_coords = np.stack(
        [conf[list(arom)].mean(0), conf[list(acc)].mean(0)]
    ).astype(np.float32)
    pp_types = ["AROM", "HACC"]
    res = al.align_molecule(
        smiles, pp_coords, pp_types, jax.random.PRNGKey(2),
        n_conformers=4, refine_steps=300,
    )
    assert res is not None
    best_rmsd = res[0][0]
    assert best_rmsd < 1.0, best_rmsd


def test_align_smiles_list(tmp_path):
    # two-point pharmacophore
    posp = tmp_path / "h.posp"
    posp.write_text("AROM 0.0 0.0 0.0\nHACC 4.0 0.0 0.0\n")
    out = al.align_smiles_list(
        ["CCOc1ccccc1", "not_valid", "c1ccccc1O"],
        posp, tmp_path / "aligned",
        n_conformers=2, num_keep=2,
    )
    assert len(out) >= 1
    assert (tmp_path / "aligned" / "rmsd_values.npy").exists()
    sdfs = list((tmp_path / "aligned").glob("*.sdf"))
    assert len(sdfs) >= 1
    from cmdgen_tpu.chem.sdf import read_sdf

    mols = read_sdf(sdfs[0])
    assert len(mols) == 2  # num_keep conformers written


def test_posed_pdb_rmsd_eval(tmp_path):
    """Posed-PDB RMSD eval (VERDICT r1 item 9): embed a molecule, write it
    as a docked-pose PDB, build a pharmacophore from its own features, and
    check the eval aligns it back with a finite, small RMSD and writes
    rmsd_values.npy."""
    from cmdgen_tpu.chem.features import get_features
    from cmdgen_tpu.pipeline.evaluate import eval_alignment_rmsd_posed

    smiles = "CCOc1ccccc1"
    mol = mol_from_smiles(smiles)
    conf = np.asarray(
        embed_conformers(mol, 1, jax.random.PRNGKey(5), refine_steps=400)
    )[0]
    # write the pose as a HETATM-only PDB file
    lines = []
    for i, a in enumerate(mol.atoms):
        x, y, z = conf[i]
        lines.append(
            f"HETATM{i+1:>5} {a.symbol+str(i):<4} LIG A 101    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}"
            f"          {a.symbol:>2}"
        )
    pose = tmp_path / "pose.pdb"
    pose.write_text("\n".join(lines) + "\n")

    feats = get_features(mol)
    arom = next(a for f, a in feats if f == "Aromatic")
    acc = next(a for f, a in feats if f == "Acceptor")
    posp = tmp_path / "hyp.posp"
    ar = conf[list(arom)].mean(0)
    ac = conf[list(acc)].mean(0)
    posp.write_text(
        f"AROM {ar[0]:.3f} {ar[1]:.3f} {ar[2]:.3f}\n"
        f"HACC {ac[0]:.3f} {ac[1]:.3f} {ac[2]:.3f}\n"
    )

    out = eval_alignment_rmsd_posed(
        [pose], posp, n_conformers=4, tolerance=1, out_dir=tmp_path / "out"
    )
    assert out["n_aligned"] == 1, out
    assert out["n_failed"] == 0
    assert np.isfinite(out["rmsd_mean"])
    assert out["rmsd_mean"] < 3.5, out
    vals = np.load(tmp_path / "out" / "rmsd_values.npy")
    assert vals.shape == (1,)


def test_posed_pdb_rmsd_eval_failures_counted(tmp_path):
    from cmdgen_tpu.pipeline.evaluate import eval_alignment_rmsd_posed

    bad = tmp_path / "bad.pdb"
    bad.write_text("not a pdb\n")
    posp = tmp_path / "hyp.posp"
    posp.write_text("AROM 0 0 0\nHACC 1 0 0\n")
    out = eval_alignment_rmsd_posed([bad], posp, n_conformers=2)
    assert out["n_aligned"] == 0 and out["n_failed"] == 1
