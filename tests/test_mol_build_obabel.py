"""OpenBabel-equivalent build path: ConnectTheDots + PerceiveBondOrders +
ff_relax (vs DiffPhar/analysis/molecule_builder.py:58-88, 207-216)."""
import numpy as np
import pytest

from cmdgen_tpu.chem import mol_build
from cmdgen_tpu.chem.mol import write_smiles


def _benzene():
    # regular hexagon, C-C 1.39 Å (aromatic)
    r = 1.39
    ang = np.arange(6) * np.pi / 3
    coords = np.stack(
        [r / (2 * np.sin(np.pi / 6)) * np.cos(ang),
         r / (2 * np.sin(np.pi / 6)) * np.sin(ang),
         np.zeros(6)], axis=1)
    return ["C"] * 6, coords.astype(np.float64)


def test_connect_the_dots_basic():
    # ethane heavy atoms: C-C at 1.54 Å connects; a far O does not
    symbols = ["C", "C", "O"]
    coords = np.array([[0, 0, 0], [1.54, 0, 0], [8.0, 0, 0]])
    pairs = mol_build.connect_the_dots(symbols, coords)
    assert [(i, j) for i, j, _ in pairs] == [(0, 1)]


def test_connect_the_dots_overlap_floor():
    # coincident atoms (< 0.16 Å) are NOT bonded (OB overlap rule)
    pairs = mol_build.connect_the_dots(
        ["C", "C"], np.array([[0, 0, 0], [0.05, 0, 0]]))
    assert pairs == []


def test_over_coordination_trim_drops_longest():
    # central C with five C neighbors: the longest spoke is trimmed
    spokes = np.array([
        [1.50, 0, 0], [-1.50, 0, 0], [0, 1.50, 0], [0, -1.50, 0],
        [0, 0, 1.62],  # longest
    ])
    symbols = ["C"] * 6
    coords = np.vstack([[0, 0, 0], spokes])
    pairs = mol_build.connect_the_dots(symbols, coords)
    deg0 = sum(1 for i, j, _ in pairs if 0 in (i, j))
    assert deg0 == 4
    assert not any({i, j} == {0, 5} for i, j, _ in pairs)


def test_perceive_orders_respects_valence():
    # carbonate-like: central C with three O at double-bond distance.
    # Per-pair EDM assignment gives three doubles (valence 6 -> rejected);
    # the OB path promotes exactly one (free valence bookkeeping).
    r = 1.22
    ang = np.array([0, 2 * np.pi / 3, 4 * np.pi / 3])
    coords = np.vstack([
        [0, 0, 0],
        np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(3)], axis=1),
    ])
    symbols = ["C", "O", "O", "O"]
    edm = mol_build.make_mol(symbols, coords, perceive_aromatic=False)
    assert not edm.check_valence()  # the EDM path over-valences here
    ob = mol_build.make_mol_obabel(symbols, coords)
    orders = sorted(b.order for b in ob.bonds)
    assert orders == [1, 1, 2]
    assert ob.check_valence()


def test_triple_bond_angle_gate():
    # acetonitrile heavy atoms: C-C 1.46, C#N 1.16, linear at the nitrile C
    symbols = ["C", "C", "N"]
    coords = np.array([[0, 0, 0], [1.46, 0, 0], [2.62, 0, 0]])
    mol = mol_build.make_mol_obabel(symbols, coords)
    cn = mol.bond_between(1, 2)
    assert cn is not None and cn.order == 3
    # bent geometry at the same distances must NOT get a triple
    bent = np.array([[0, 0, 0], [1.46, 0, 0], [1.9, 1.05, 0]])
    mol2 = mol_build.make_mol_obabel(symbols, bent)
    cn2 = mol2.bond_between(1, 2)
    assert cn2 is None or cn2.order < 3


def test_benzene_aromatic_via_obabel():
    symbols, coords = _benzene()
    mol = mol_build.make_mol_obabel(symbols, coords)
    assert len(mol.bonds) == 6
    assert all(b.aromatic for b in mol.bonds)
    smi = write_smiles(mol, canonical=True)
    assert smi.count("c") == 6


def test_build_molecule_dispatcher():
    symbols, coords = _benzene()
    ob = mol_build.build_molecule(symbols, coords, use_openbabel=True)
    edm = mol_build.build_molecule(symbols, coords, use_openbabel=False)
    assert len(ob.bonds) == len(edm.bonds) == 6


def test_ff_relax_restores_bond_length():
    # stretched ethane C-C (1.9 Å) relaxes toward the 1.54 Å table length
    symbols = ["C", "C"]
    coords = np.array([[0.0, 0, 0], [1.9, 0, 0]])
    mol = mol_build.make_mol_obabel(symbols, coords)
    assert len(mol.bonds) == 1
    relaxed, _ = mol_build.ff_relax(mol, coords, max_iter=300)
    d = float(np.linalg.norm(relaxed[0] - relaxed[1]))
    assert abs(d - 1.54) < 0.02


def test_ff_relax_angle():
    # water-like bent O with two C at 109.5 -> ideal sp3 kept stable;
    # a squeezed 60-degree angle opens up
    symbols = ["O", "C", "C"]
    squeezed = np.array([
        [0.0, 0, 0], [1.43, 0, 0],
        [1.43 * np.cos(np.pi / 3), 1.43 * np.sin(np.pi / 3), 0],
    ])
    mol = mol_build.make_mol_obabel(symbols, squeezed)
    # the 60-degree C...C pair may connect; keep only O bonds for the test
    if mol.bond_between(1, 2) is not None:
        pytest.skip("C-C within covalent net at this synthetic geometry")
    relaxed, _ = mol_build.ff_relax(mol, squeezed, max_iter=400)
    v1, v2 = relaxed[1] - relaxed[0], relaxed[2] - relaxed[0]
    ang = np.degrees(np.arccos(
        np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))))
    assert ang > 90.0


def test_process_molecule_openbabel_and_relax():
    symbols, coords = _benzene()
    out = mol_build.process_molecule(
        symbols, coords, use_openbabel=True, relax_iter=50)
    assert out is not None
    mol, new_coords, smi = out
    assert smi.count("c") == 6
    assert new_coords.shape == coords.shape
