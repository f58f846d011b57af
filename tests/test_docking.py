"""Docking-adapter contract tests with stub binaries.

The real smina/qvina binaries don't exist in this image, so these tests run
the adapters (DiffPhar/analysis/docking.py:12-88 equivalents) against stub
shell scripts that echo canned vina-style output — exercising the PDBQT
writer, the CLI argument contract, the box-at-CoM logic, and the stdout
score parsing that would otherwise be dead code here.
"""
import os
import stat
from pathlib import Path

import numpy as np
import pytest

from cmdgen_tpu.chem.mol import mol_from_smiles
from cmdgen_tpu.pipeline import docking


def _make_stub(path: Path, body: str):
    path.write_text("#!/bin/sh\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


@pytest.fixture
def mol_and_coords():
    mol = mol_from_smiles("CCO")
    assert mol is not None
    rng = np.random.RandomState(0)
    coords = rng.randn(len(mol.atoms), 3) * 2.0 + 10.0
    return mol, coords


def test_write_pdbqt_format(tmp_path, mol_and_coords):
    mol, coords = mol_and_coords
    out = tmp_path / "lig.pdbqt"
    docking.write_pdbqt(out, mol, coords)
    lines = out.read_text().splitlines()
    assert lines[0] == "ROOT"
    assert lines[-2] == "ENDROOT"
    assert lines[-1] == "TORSDOF 0"
    atoms = [l for l in lines if l.startswith("ATOM")]
    # heavy atoms + the placed hydroxyl HD hydrogen (round-5 prep parity)
    assert len(atoms) == len(mol.atoms) + 1
    # coordinates round-trip at %8.3f precision in the right columns
    x = float(atoms[0][30:38])
    y = float(atoms[0][38:46])
    z = float(atoms[0][46:54])
    np.testing.assert_allclose([x, y, z], coords[0], atol=5e-4)
    # AD4 typing: sp3 carbons type 'C', the hydroxyl oxygen 'OA'
    assert atoms[0].split()[-1] == "C"
    assert any(a.split()[-1] == "OA" for a in atoms)


def test_ad4_aromatic_typing(tmp_path):
    mol = mol_from_smiles("c1ccccc1O")
    out = tmp_path / "ar.pdbqt"
    docking.write_pdbqt(out, mol, np.zeros((len(mol.atoms), 3)))
    types = [l.split()[-1] for l in out.read_text().splitlines()
             if l.startswith("ATOM")]
    assert "A" in types   # aromatic carbon
    assert "OA" in types  # acceptor oxygen


def test_smina_score_only_parses_affinity(tmp_path, mol_and_coords):
    mol, coords = mol_and_coords
    lig = tmp_path / "lig.pdbqt"
    docking.write_pdbqt(lig, mol, coords)
    rec = tmp_path / "rec.pdbqt"
    rec.write_text("ATOM      1 C    REC A   1       0.000   0.000   0.000\n")
    stub = _make_stub(
        tmp_path / "smina",
        'echo "args: $@" > "%s"\n'
        'echo "Affinity: -7.31 (kcal/mol)"\n' % (tmp_path / "argv.txt"),
    )
    score = docking.smina_score_only(rec, lig, binary=stub)
    assert score == pytest.approx(-7.31)
    argv = (tmp_path / "argv.txt").read_text()
    assert "--score_only" in argv and str(lig) in argv and str(rec) in argv


def test_qvina_dock_parses_pose_table(tmp_path, mol_and_coords):
    mol, coords = mol_and_coords
    lig = tmp_path / "lig.pdbqt"
    docking.write_pdbqt(lig, mol, coords)
    rec = tmp_path / "rec.pdbqt"
    rec.write_text("\n")
    stub = _make_stub(
        tmp_path / "qvina2",
        'echo "args: $@" > "%s"\n'
        "cat <<'EOF'\n"
        "mode |   affinity | dist from best mode\n"
        "     | (kcal/mol) | rmsd l.b.| rmsd u.b.\n"
        "-----+------------+----------+----------\n"
        "   1       -8.1      0.000      0.000\n"
        "   2       -7.5      1.233      2.310\n"
        "   3       -6.9      2.001      3.444\n"
        "EOF\n" % (tmp_path / "argv.txt"),
    )
    scores = docking.qvina_dock(
        rec, lig, center=(1.0, 2.0, 3.0), out_path=tmp_path / "out.pdbqt",
        binary=stub,
    )
    assert scores == [pytest.approx(-8.1), pytest.approx(-7.5),
                      pytest.approx(-6.9)]
    argv = (tmp_path / "argv.txt").read_text()
    assert "--center_x 1.0" in argv and "--center_z 3.0" in argv
    assert "--size_x 20.0" in argv


def test_calculate_qvina2_score_box_at_com(tmp_path, mol_and_coords, monkeypatch):
    """End-to-end: binary discovery via PATH, PDBQT write, box at the
    ligand CoM, top pose score returned (docking.py:27-88)."""
    mol, coords = mol_and_coords
    bindir = tmp_path / "bin"
    bindir.mkdir()
    _make_stub(
        bindir / "qvina2.1",
        'echo "args: $@" > "%s"\n'
        'echo "   1       -9.4      0.000      0.000"\n' % (tmp_path / "argv.txt"),
    )
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    assert docking.docking_available()
    rec = tmp_path / "rec.pdbqt"
    rec.write_text("\n")
    score = docking.calculate_qvina2_score(rec, mol, coords, tmp_path / "wd")
    assert score == pytest.approx(-9.4)
    argv = (tmp_path / "argv.txt").read_text()
    com = coords.mean(axis=0)
    assert f"--center_x {com[0]}" in argv
    assert (tmp_path / "wd" / "ligand.pdbqt").exists()


def test_docking_unavailable_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty dir: no binaries
    assert not docking.docking_available()
    with pytest.raises(RuntimeError):
        docking.smina_score_only("r", "l")
    with pytest.raises(RuntimeError):
        docking.qvina_dock("r", "l", (0, 0, 0), "o")
