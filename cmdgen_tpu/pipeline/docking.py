"""Docking adapters: qvina2 / smina subprocess wrappers.

Behavioral equivalent of DiffPhar/analysis/docking.py:12-148: score or dock
generated poses with external binaries. This environment ships neither the
binaries nor OpenBabel, so everything is gated on availability
(``docking_available``) and the SDF→PDBQT conversion is a built-in minimal
writer (AD4-ish atom typing) instead of the reference's ``obabel`` shell-out
(docking.py:21-24).
"""
from __future__ import annotations

import re
import shutil
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from cmdgen_tpu.chem.mol import Mol


def find_binary(*names: str) -> Optional[str]:
    for n in names:
        p = shutil.which(n)
        if p:
            return p
    return None


def docking_available() -> bool:
    return find_binary("qvina2.1", "qvina2", "qvina") is not None or (
        find_binary("smina", "smina.static") is not None
    )


def _ad4_type(mol: Mol, i: int) -> str:
    a = mol.atoms[i]
    s = a.symbol
    if s == "C":
        return "A" if a.aromatic else "C"
    if s == "N":
        # N with no H = acceptor NA
        return "NA" if mol.total_h(i) == 0 else "N"
    if s == "O":
        return "OA"
    if s == "S":
        return "SA"
    if s == "H":
        return "HD"
    return s


def write_pdbqt(
    path, mol: Mol, coords: np.ndarray, name: str = "LIG"
):
    """Minimal rigid-ligand PDBQT writer (replaces obabel; charges set to 0,
    no rotatable-branch tree — scoring-only / rigid docking)."""
    lines = ["ROOT"]
    for i, a in enumerate(mol.atoms):
        x, y, z = coords[i]
        t = _ad4_type(mol, i)
        lines.append(
            f"ATOM  {i+1:>5} {a.symbol:<4} {name:<3} A   1    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}    "
            f"{0.0:6.3f} {t:<2}"
        )
    lines.append("ENDROOT")
    lines.append("TORSDOF 0")
    Path(path).write_text("\n".join(lines) + "\n")


def smina_score_only(
    receptor_pdbqt, ligand_pdbqt, binary: Optional[str] = None
) -> Optional[float]:
    """``smina --score_only`` affinity (docking.py:12-18)."""
    binary = binary or find_binary("smina", "smina.static")
    if binary is None:
        raise RuntimeError("smina binary not available")
    out = subprocess.run(
        [binary, "--score_only", "-r", str(receptor_pdbqt),
         "-l", str(ligand_pdbqt)],
        capture_output=True, text=True, timeout=300,
    )
    m = re.search(r"Affinity:\s*([\-0-9.]+)", out.stdout)
    return float(m.group(1)) if m else None


def qvina_dock(
    receptor_pdbqt,
    ligand_pdbqt,
    center: Sequence[float],
    out_path,
    size: float = 20.0,
    exhaustiveness: int = 16,
    binary: Optional[str] = None,
) -> Optional[List[float]]:
    """qvina2 docking with the box centered at the ligand CoM
    (docking.py:27-88). Returns the pose scores parsed from stdout."""
    binary = binary or find_binary("qvina2.1", "qvina2", "qvina")
    if binary is None:
        raise RuntimeError("qvina binary not available")
    cx, cy, cz = center
    out = subprocess.run(
        [
            binary, "--receptor", str(receptor_pdbqt),
            "--ligand", str(ligand_pdbqt),
            "--center_x", str(cx), "--center_y", str(cy), "--center_z", str(cz),
            "--size_x", str(size), "--size_y", str(size), "--size_z", str(size),
            "--exhaustiveness", str(exhaustiveness),
            "--out", str(out_path),
        ],
        capture_output=True, text=True, timeout=1800,
    )
    scores = [
        float(m.group(1))
        for m in re.finditer(r"^\s*\d+\s+([\-0-9.]+)\s", out.stdout, re.M)
    ]
    return scores or None


def calculate_qvina2_score(
    receptor_pdbqt, mol: Mol, coords: np.ndarray, workdir,
    score_only: bool = False,
) -> Optional[float]:
    """End-to-end score of one posed molecule (docking.py:27-88)."""
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    lig = workdir / "ligand.pdbqt"
    write_pdbqt(lig, mol, coords)
    if score_only:
        return smina_score_only(receptor_pdbqt, lig)
    center = coords.mean(axis=0)
    scores = qvina_dock(receptor_pdbqt, lig, center, workdir / "docked.pdbqt")
    return scores[0] if scores else None
