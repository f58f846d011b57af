"""Docking-prep fidelity tests (VERDICT r4 item 5).

The reference preps ligands via obabel (Gasteiger charges + rotatable
BRANCH tree; DiffPhar/analysis/docking.py:21-24) and receptors via
MGLTools prepare_receptor4.py (docking_py27.py:6-25). Neither binary is in
this image, so these tests pin the native implementations to published
Gasteiger-Marsili values, the AutoDock rotor rules, and PDBQT structural
invariants (nesting, serial references, TORSDOF, fixed columns) instead of
a binary-produced golden file.
"""
import numpy as np
import pytest

from cmdgen_tpu.chem.gasteiger import gasteiger_charges, heavy_charges_ad4
from cmdgen_tpu.chem.mol import mol_from_smiles
from cmdgen_tpu.pipeline import docking


# ------------------------------------------------------------- charges

def test_gasteiger_methane_literature():
    # Gasteiger & Marsili 1980: CH4 carbon -0.078, H +0.0195 each
    m = mol_from_smiles("C")
    heavy, hs = gasteiger_charges(m)
    assert heavy[0] == pytest.approx(-0.078, abs=2e-3)
    assert hs[0][0] == pytest.approx(0.0195, abs=1e-3)


def test_gasteiger_methanol_literature():
    # published PEOE values: C +0.033, O -0.398, H(O) +0.209
    m = mol_from_smiles("CO")
    heavy, hs = gasteiger_charges(m)
    assert heavy[0] == pytest.approx(0.033, abs=3e-3)
    assert heavy[1] == pytest.approx(-0.398, abs=3e-3)
    assert hs[1][0] == pytest.approx(0.209, abs=3e-3)


def test_gasteiger_benzene_symmetry_and_conservation():
    m = mol_from_smiles("c1ccccc1")
    heavy, hs = gasteiger_charges(m)
    assert np.allclose(heavy, heavy[0])
    assert heavy[0] == pytest.approx(-0.062, abs=3e-3)
    total = sum(heavy) + sum(sum(h) for h in hs)
    assert total == pytest.approx(0.0, abs=1e-9)


def test_gasteiger_charge_conservation_with_formal_charge():
    m = mol_from_smiles("C[N+](C)(C)C")
    heavy, hs = gasteiger_charges(m)
    total = sum(heavy) + sum(sum(h) for h in hs)
    assert total == pytest.approx(1.0, abs=1e-9)


def test_ad4_partition_merges_nonpolar_h_only():
    m = mol_from_smiles("CO")
    heavy, keep = heavy_charges_ad4(m)
    assert keep[0] == []          # CH3 hydrogens merged into C
    assert len(keep[1]) == 1      # hydroxyl H kept (polar, HD)
    raw_heavy, raw_h = gasteiger_charges(m)
    assert heavy[0] == pytest.approx(raw_heavy[0] + sum(raw_h[0]))
    assert heavy[1] == pytest.approx(raw_heavy[1])


# ------------------------------------------------------- rotor detection

@pytest.mark.parametrize(
    "smiles,n_rot",
    [
        ("CCCC", 1),              # only the central C-C moves heavy atoms
        ("CCO", 0),               # both bonds terminal-heavy
        ("c1ccccc1c1ccccc1", 1),  # biphenyl pivot
        ("CC(=O)NC", 0),          # amide excluded
        ("C1CCCCC1", 0),          # ring bonds excluded
        ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 4),  # ibuprofen
    ],
)
def test_rotatable_bonds(smiles, n_rot):
    mol = mol_from_smiles(smiles)
    assert len(docking.rotatable_bonds(mol)) == n_rot


# ------------------------------------------------------- branch tree

def _parse_pdbqt(text):
    atoms, stack, branches = {}, [], []
    torsdof = None
    for line in text.splitlines():
        if line.startswith("ATOM"):
            serial = int(line[6:11])
            atoms[serial] = {
                "name": line[12:16].strip(),
                "x": float(line[30:38]),
                "y": float(line[38:46]),
                "z": float(line[46:54]),
                "q": float(line[70:76]),
                "type": line[77:79].strip(),
            }
        elif line.startswith("BRANCH"):
            a, b = (int(v) for v in line.split()[1:3])
            stack.append((a, b))
            branches.append((a, b))
        elif line.startswith("ENDBRANCH"):
            a, b = (int(v) for v in line.split()[1:3])
            assert stack and stack[-1] == (a, b), "mismatched nesting"
            stack.pop()
        elif line.startswith("TORSDOF"):
            torsdof = int(line.split()[1])
    assert not stack, "unclosed BRANCH"
    return atoms, branches, torsdof


def test_write_pdbqt_flexible_structure(tmp_path):
    smi = "CC(C)Cc1ccc(cc1)C(C)C(=O)O"
    mol = mol_from_smiles(smi)
    coords = np.random.RandomState(0).randn(mol.n_atoms, 3) * 3
    out = tmp_path / "lig.pdbqt"
    docking.write_pdbqt(out, mol, coords)
    atoms, branches, torsdof = _parse_pdbqt(out.read_text())
    assert torsdof == 4 and len(branches) == 4
    # every BRANCH references already/soon-defined serials; child = first
    # atom after the record
    serials = sorted(atoms)
    assert serials == list(range(1, len(serials) + 1))
    for a, b in branches:
        assert a in atoms and b in atoms
    # heavy atoms + 1 polar hydrogen (the COOH proton)
    assert len(atoms) == mol.n_atoms + 1
    types = [v["type"] for v in atoms.values()]
    assert types.count("HD") == 1 and "A" in types and "OA" in types
    # total written charge ~ molecular formal charge (0); nonpolar H merged
    assert sum(v["q"] for v in atoms.values()) == pytest.approx(0.0, abs=2e-2)


def test_write_pdbqt_rigid_mode_back_compat(tmp_path):
    mol = mol_from_smiles("CCO")
    coords = np.zeros((3, 3))
    out = tmp_path / "rigid.pdbqt"
    docking.write_pdbqt(out, mol, coords, flexible=False, add_polar_h=False)
    lines = out.read_text().splitlines()
    assert lines[0] == "ROOT" and lines[-2] == "ENDROOT"
    assert lines[-1] == "TORSDOF 0"
    assert sum(1 for l in lines if l.startswith("ATOM")) == 3


# ------------------------------------------------------- receptor prep

def _hexagon(center, r=1.39):
    pts = []
    for k in range(6):
        ang = np.pi / 3 * k
        pts.append(center + np.array([r * np.cos(ang), r * np.sin(ang), 0.0]))
    return pts


def _dipeptide_pdb():
    """ALA-PHE dipeptide with covalent-radius-consistent geometry."""
    rows = []

    def atom(serial, name, res, resid, xyz, element):
        x, y, z = xyz
        rows.append(
            f"ATOM  {serial:>5} {name:<4} {res:<3} A{resid:>4}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {element:>2}"
        )

    # ALA backbone along x, zigzag in y
    n1 = np.array([0.0, 0.0, 0.0])
    ca1 = n1 + [1.25, 0.75, 0.0]
    cb1 = ca1 + [-0.3, 1.45, 0.5]
    c1 = ca1 + [1.45, -0.45, 0.0]
    o1 = c1 + [0.4, -1.15, 0.0]
    n2 = c1 + [1.2, 0.55, 0.0]
    ca2 = n2 + [1.3, 0.65, 0.0]
    c2 = ca2 + [1.45, -0.45, 0.0]
    o2 = c2 + [0.4, -1.15, 0.0]
    oxt = c2 + [1.25, 0.55, 0.0]
    cb2 = ca2 + [-0.25, 1.5, 0.2]
    # PHE ring: CG bonded to CB, regular hexagon in a shifted plane
    cg = cb2 + [0.0, 1.45, 0.3]
    ring = _hexagon(cg + np.array([1.39, 0.0, 0.0]))
    # ring[3] is the far vertex; ring[0] coincides with... use explicit ring:
    # hexagon centered so that one vertex == cg
    ring = [p - (ring[3] - cg) for p in ring]  # translate vertex 3 onto cg
    names = ["CZ", "CE1", "CD1", "CG", "CD2", "CE2"]

    atom(1, "N", "ALA", 1, n1, "N")
    atom(2, "CA", "ALA", 1, ca1, "C")
    atom(3, "CB", "ALA", 1, cb1, "C")
    atom(4, "C", "ALA", 1, c1, "C")
    atom(5, "O", "ALA", 1, o1, "O")
    atom(6, "N", "PHE", 2, n2, "N")
    atom(7, "CA", "PHE", 2, ca2, "C")
    atom(8, "CB", "PHE", 2, cb2, "C")
    for i, (nm, p) in enumerate(zip(names, ring)):
        atom(9 + i, nm, "PHE", 2, p, "C")
    atom(15, "C", "PHE", 2, c2, "C")
    atom(16, "O", "PHE", 2, o2, "O")
    atom(17, "OXT", "PHE", 2, oxt, "O")
    return "\n".join(rows) + "\n"


def test_receptor_mol_graph():
    mol, xyz, meta = docking.receptor_mol_from_pdb(_dipeptide_pdb())
    assert mol.n_atoms == 17
    names = {(m[0], m[1]): i for i, m in enumerate(meta)}
    # peptide bond found by ConnectTheDots
    c1, n2 = names[("ALA", "C")], names[("PHE", "N")]
    assert any(
        {b.a1, b.a2} == {c1, n2} for b in mol.bonds
    ), "peptide bond missing"
    # backbone carbonyl promoted to double
    o1 = names[("ALA", "O")]
    bo = mol.bond_between(c1, o1)
    assert bo is not None and bo.order == 2
    # ring closed: every ring atom has exactly 2 ring neighbors
    ring_idx = [names[("PHE", n)] for n in
                ("CG", "CD1", "CD2", "CE1", "CE2", "CZ")]
    for i in ring_idx:
        assert mol.atoms[i].aromatic
        nring = sum(1 for j in mol.heavy_neighbors(i) if j in ring_idx)
        assert nring == 2, f"ring atom {meta[i]} has {nring} ring bonds"


def test_prepare_receptor_pdbqt(tmp_path):
    out = docking.prepare_receptor_pdbqt(_dipeptide_pdb(), tmp_path / "r.pdbqt")
    lines = out.read_text().splitlines()
    assert len(lines) == 17 and all(l.startswith("ATOM") for l in lines)
    types = [l[77:79].strip() for l in lines]
    qs = np.array([float(l[70:76]) for l in lines])
    names = [l[12:16].strip() for l in lines]
    # aromatic ring -> A; carbonyl O -> OA; backbone N (has H) -> N
    assert types[names.index("CZ")] == "A"
    assert types[names.index("O")] == "OA"
    assert types[names.index("N")] == "N"
    # no hydrogens written (CrossDocked prep adds none) but their charge
    # mass is merged: total ~ formal charge (-1 from OXT terminus)
    assert not any(t == "HD" for t in types)
    assert qs.sum() == pytest.approx(-1.0, abs=5e-2)
    # carbonyl oxygens negative, backbone N negative, CA positive-ish
    assert qs[names.index("O")] < -0.2
