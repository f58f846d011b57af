"""Molecular descriptors: MW, logP, TPSA, H-bond counts, QED, SA, Lipinski.

Stand-ins for the RDKit descriptor calls used by the reference's quality
metrics (DiffPhar/analysis/metrics.py:157-248) and GCPG's property
conditions [MW, logP, QED, SAS, HBA, HBD, RotBonds]
(GCPG/train_chembl33_baseline.py:151-157). Implementations:

- MW: exact formula weight (chem/mol.py atomic weights).
- logP: simplified Wildman–Crippen atomic contributions (coarse atom
  classes, not the full 68-type table — a documented approximation).
- TPSA: Ertl 2000 N/O fragment contributions (common environments).
- HBA/HBD: Lipinski definitions (N+O count / NH+OH count).
- QED: Bickerton 2012 with the published ADS parameter sets over
  (MW, ALOGP, HBA, HBD, PSA, ROTB, AROM, ALERTS); structural alerts are
  approximated by a small built-in alert list.
- SA score: the full sascorer.py computation (fragment term + size/
  stereo/spiro/bridgehead/macrocycle penalties + symmetry correction +
  the same 1..10 transform); the fragment-frequency table is derived from
  an embedded 230-molecule drug corpus (chem/sa_corpus.py) instead of the
  unshipped fpscores.pkl.gz — r = 0.87 vs RDKit on a 13-anchor set,
  simple marketed drugs within ±0.6 (documented deviation).
- Morgan-style hashed circular fingerprints + Tanimoto for diversity.

Validation (tests/test_descriptors.py golden set, 33 molecules with
published PubChem/Cactvs values): MW exact (<0.05); TPSA exact (<0.15)
except fused-aromatic-N systems where aromaticity perception differs from
RDKit (caffeine +3.4 worst case); logP max |dev| < 2.0, mean |dev| ~0.51
vs XLogP3 (tested < 0.6). The logP tail (hexane -1.3, glycine +1.8) is
XLogP3-vs-Crippen *model* divergence, not implementation error — RDKit's
own Crippen logP shows the same gaps (hexane ~2.7 vs XLogP3 3.9).
"""
from __future__ import annotations

import math
import zlib
from typing import Dict, Optional, Set

from cmdgen_tpu.chem.mol import Mol, mol_from_smiles


def _as_mol(m) -> Optional[Mol]:
    if isinstance(m, str):
        return mol_from_smiles(m)
    return m


# ------------------------------------------------------------------- basic

def mol_weight(m) -> float:
    mol = _as_mol(m)
    return mol.molecular_weight() if mol else float("nan")


def hba(m) -> int:
    """Lipinski acceptor count: N + O atoms."""
    mol = _as_mol(m)
    return sum(1 for a in mol.atoms if a.symbol in ("N", "O"))


def hbd(m) -> int:
    """Lipinski donor count: N-H + O-H."""
    mol = _as_mol(m)
    return sum(
        1
        for i, a in enumerate(mol.atoms)
        if a.symbol in ("N", "O") and mol.total_h(i) > 0
    )


def rotatable_bonds(m) -> int:
    """Single, non-ring bonds between two non-terminal heavy atoms,
    excluding amide C-N (the RDKit strict definition, approximately)."""
    mol = _as_mol(m)
    ring_flags = mol.ring_bond_flags()
    count = 0
    for bi, b in enumerate(mol.bonds):
        if b.order != 1 or b.aromatic or ring_flags[bi]:
            continue
        if mol.degree(b.a1) < 2 or mol.degree(b.a2) < 2:
            continue
        # amide exclusion
        def is_amide(c, n):
            return (
                mol.atoms[c].symbol == "C"
                and mol.atoms[n].symbol == "N"
                and any(
                    mol.bonds[x].order == 2 and mol.atoms[nb].symbol == "O"
                    for nb, x in mol.neighbors(c)
                )
            )

        if is_amide(b.a1, b.a2) or is_amide(b.a2, b.a1):
            continue
        count += 1
    return count


def aromatic_ring_count(m) -> int:
    mol = _as_mol(m)
    return len(mol.aromatic_rings())


def ring_count(m) -> int:
    mol = _as_mol(m)
    return len(mol.rings())


# -------------------------------------------------------------------- logP

# coarse Wildman-Crippen-style contributions per (symbol, aromatic, context)
def crippen_logp(m) -> float:
    mol = _as_mol(m)
    if mol is None:
        return float("nan")
    total = 0.0
    for i, a in enumerate(mol.atoms):
        s = a.symbol
        nh = mol.total_h(i)
        het = sum(
            1 for nb in mol.heavy_neighbors(i)
            if mol.atoms[nb].symbol not in ("C", "H")
        )
        if s == "C":
            if a.aromatic:
                total += 0.29 if het == 0 else 0.14
            else:
                has_pi = any(mol.bonds[bi].order > 1 for _, bi in mol.neighbors(i))
                if het > 0:
                    total += -0.03 if not has_pi else -0.10
                else:
                    total += 0.14 if not has_pi else 0.08
            total += 0.123 * nh  # hydrogens on carbon
        elif s == "N":
            if a.charge > 0:
                total += -1.95
            elif a.aromatic:
                total += -0.49
            else:
                total += -0.60 - 0.20 * nh
        elif s == "O":
            if a.aromatic:
                total += 0.11
            else:
                dbl_to = [
                    mol.atoms[nb].symbol
                    for nb, bi in mol.neighbors(i)
                    if mol.bonds[bi].order == 2
                ]
                if any(t in ("S", "N", "P") for t in dbl_to):
                    total += -1.326  # oxide O (Wildman-Crippen O12: S=O, N-oxide)
                elif dbl_to:
                    total += -0.12
                else:
                    total += -0.40 if nh > 0 else -0.25
        elif s == "S":
            total += 0.65
        elif s == "P":
            total += 0.86
        elif s == "F":
            total += 0.42
        elif s == "Cl":
            total += 0.71
        elif s == "Br":
            total += 0.89
        elif s == "I":
            total += 1.05
        else:
            total += 0.0
    return total


# -------------------------------------------------------------------- TPSA

def tpsa(m) -> float:
    """Ertl topological PSA, common N/O environments."""
    mol = _as_mol(m)
    if mol is None:
        return float("nan")
    total = 0.0
    for i, a in enumerate(mol.atoms):
        nh = mol.total_h(i)
        deg = mol.degree(i)
        orders = sorted(
            mol.bonds[bi].order for _, bi in mol.neighbors(i)
        )
        arom = a.aromatic
        if a.symbol == "N":
            if a.charge == 0:
                if arom:
                    n_arom_bonds = sum(
                        1 for _, bi in mol.neighbors(i)
                        if mol.bonds[bi].aromatic
                    )
                    if nh == 0 and deg == 2:
                        total += 12.89
                    elif nh == 1:
                        total += 15.79
                    elif n_arom_bonds >= 3:
                        total += 4.41  # ring-fusion aromatic N [n](:*)(:*):*
                    else:
                        total += 4.93  # substituted aromatic N [n](-*)(:*):*
                else:
                    if nh == 0:
                        if 3 in orders:
                            total += 23.79  # nitrile
                        elif 2 in orders:
                            total += 12.36
                        else:
                            total += 3.24
                    elif nh == 1:
                        total += 12.03 if 2 not in orders else 21.94
                    else:
                        total += 26.02
            elif a.charge > 0:
                total += {0: 0.0, 1: 4.44, 2: 16.61, 3: 27.64, 4: 27.64}.get(nh, 27.64)
        elif a.symbol == "O":
            if a.charge < 0:
                total += 23.06
            elif arom:
                total += 13.14
            elif 2 in orders:
                total += 17.07
            elif nh > 0:
                total += 20.23
            else:
                total += 9.23
        elif a.symbol == "S":
            # extended Ertl S contributions (the Cactvs/PubChem convention)
            n_dbl = orders.count(2)
            if nh > 0:
                total += 38.80
            elif n_dbl >= 2:
                total += 8.38   # sulfone S(=O)(=O)
            elif n_dbl == 1 and deg >= 3:
                total += 19.21  # sulfoxide >S=O
            elif n_dbl == 1:
                total += 32.09  # thiocarbonyl =S
            elif arom:
                total += 28.24  # aromatic s (thiophene)
            else:
                total += 25.30  # thioether/thiol-ether -S-
        elif a.symbol == "P":
            n_dbl = orders.count(2)
            if n_dbl >= 1:
                total += 9.81 if deg >= 4 else 34.14
            else:
                total += 13.59
    return total


# --------------------------------------------------------------------- QED

# Bickerton et al. 2012 ADS parameters (a, b, c, d, e, f, dmax)
_QED_ADS = {
    "MW": (2.817, 392.575, 290.749, 2.420, 49.223, 65.371, 104.981),
    "ALOGP": (3.173, 137.862, 2.535, 4.581, 0.823, 0.576, 131.319),
    "HBA": (2.949, 160.461, 3.615, 4.436, 0.290, 1.301, 148.776),
    "HBD": (1.619, 1010.051, 0.985, 0.000, 0.714, 0.921, 258.163),
    "PSA": (1.877, 125.223, 62.908, 87.834, 12.020, 28.513, 104.569),
    "ROTB": (0.010, 272.412, 2.558, 1.566, 0.756, 1.272, 239.444),
    "AROM": (3.218, 957.737, 2.275, 0.000, 1.317, 0.251, 199.664),
    "ALERTS": (0.010, 1199.094, -0.090, 0.000, 0.186, 0.875, 154.270),
}
_QED_WEIGHTS = {
    "MW": 0.66, "ALOGP": 0.46, "HBA": 0.05, "HBD": 0.61,
    "PSA": 0.06, "ROTB": 0.65, "AROM": 0.48, "ALERTS": 0.95,
}


def _ads(x: float, p) -> float:
    a, b, c, d, e, f, dmax = p
    t1 = 1 + math.exp(-(x - c + d / 2) / max(e, 1e-9))
    t2 = 1 + math.exp(-(x - c - d / 2) / max(f, 1e-9))
    y = a + b / t1 * (1 - 1 / t2)
    return max(y / dmax, 1e-9)


def _alert_count(mol: Mol) -> int:
    """Tiny built-in structural-alert list (nitro, acyl halide, aldehyde,
    azo, long aliphatic chain) — a coarse stand-in for the Brenk set."""
    alerts = 0
    for i, a in enumerate(mol.atoms):
        if a.symbol == "N" and a.charge > 0:
            o_dbl = sum(
                1 for nb, bi in mol.neighbors(i)
                if mol.atoms[nb].symbol == "O" and mol.bonds[bi].order == 2
            )
            if o_dbl >= 1:
                alerts += 1  # nitro-like
        if a.symbol == "C":
            has_dbl_o = any(
                mol.bonds[bi].order == 2 and mol.atoms[nb].symbol == "O"
                for nb, bi in mol.neighbors(i)
            )
            if has_dbl_o:
                if any(mol.atoms[nb].symbol in ("Cl", "Br", "I") for nb in mol.heavy_neighbors(i)):
                    alerts += 1  # acyl halide
                if mol.total_h(i) >= 1:
                    alerts += 1  # aldehyde
        if a.symbol == "N":
            for nb, bi in mol.neighbors(i):
                if mol.atoms[nb].symbol == "N" and mol.bonds[bi].order == 2:
                    alerts += 1  # azo (counted twice, halved below)
    return alerts


def qed(m) -> float:
    mol = _as_mol(m)
    if mol is None:
        return float("nan")
    props = {
        "MW": mol.molecular_weight(),
        "ALOGP": crippen_logp(mol),
        "HBA": hba(mol),
        "HBD": hbd(mol),
        "PSA": tpsa(mol),
        "ROTB": rotatable_bonds(mol),
        "AROM": aromatic_ring_count(mol),
        "ALERTS": _alert_count(mol) / 2,
    }
    num = 0.0
    den = 0.0
    for k, v in props.items():
        w = _QED_WEIGHTS[k]
        num += w * math.log(_ads(v, _QED_ADS[k]))
        den += w
    return math.exp(num / den)


# ---------------------------------------------------------------- SA score

def _stable_hash(obj) -> int:
    """Deterministic 32-bit hash (Python's hash() is salted per process,
    which would make precomputed fragment tables irreproducible)."""
    return zlib.crc32(repr(obj).encode())


def atom_environments(mol: Mol, radius: int = 2):
    """Morgan circular-environment IDs, radii 0..radius, one per (atom,
    radius) — the unfolded multiset RDKit's GetMorganFingerprint counts
    (sascorer.py feeds its GetNonzeroElements() into the fragment table).
    Returns a list of stable int IDs (len == n_atoms * (radius+1))."""
    inv = [
        _stable_hash(
            (a.symbol, a.charge, a.aromatic, mol.degree(i), mol.total_h(i))
        )
        for i, a in enumerate(mol.atoms)
    ]
    envs = list(inv)
    cur = inv
    for _ in range(radius):
        nxt = []
        for i in range(mol.n_atoms):
            env = sorted(
                (mol.bonds[bi].order, cur[nb])
                for nb, bi in mol.neighbors(i)
            )
            nxt.append(_stable_hash((cur[i], tuple(env))))
        envs.extend(nxt)
        cur = nxt
    return envs


_SA_TABLE: Optional[Dict[int, float]] = None


def _sa_fragment_table() -> Dict[int, float]:
    """Fragment-frequency scores, built once from the embedded corpus
    (chem/sa_corpus.py) the way the reference's fpscores.pkl.gz was built
    from PubChem: count Morgan radius-<=2 environments, score each as a
    clipped log-relative frequency (most common -> +4, ~4 decades rarer ->
    0, unknown -> -4, matching the reference's defaults)."""
    global _SA_TABLE
    if _SA_TABLE is None:
        from cmdgen_tpu.chem.sa_corpus import SA_CORPUS

        counts: Dict[int, int] = {}
        for smi in SA_CORPUS:
            mol = mol_from_smiles(smi)
            if mol is None:
                continue
            for e in atom_environments(mol):
                counts[e] = counts.get(e, 0) + 1
        c_max = max(counts.values())
        # most common -> +3.0, each decade rarer one unit lower; unknown
        # fragments default to -4 at lookup. Calibrated against RDKit
        # sascorer values on a 13-anchor set (marketed drugs 1.5-2.5,
        # sugars ~3-4.5, caged/exotic 5-6): r = 0.87, MSE = 0.79, simple
        # drugs within +-0.6.
        _SA_TABLE = {
            e: max(-4.0, min(4.0, 3.0 + math.log10(c / c_max)))
            for e, c in counts.items()
        }
    return _SA_TABLE


def _spiro_and_bridgeheads(rings) -> tuple:
    """(n_spiro, n_bridgehead) atoms from SSSR ring pairs: a shared single
    atom is spiro; rings sharing >= 3 atoms (a bridge path) contribute the
    two endpoints of the shared path as bridgeheads."""
    spiro, bridge = set(), set()
    for ai in range(len(rings)):
        for bi in range(ai + 1, len(rings)):
            shared = set(rings[ai]) & set(rings[bi])
            if len(shared) == 1:
                spiro |= shared
            elif len(shared) >= 3:
                # endpoints of the shared path: shared atoms adjacent (in
                # ring order) to exactly one other shared atom
                for ring in (rings[ai], rings[bi]):
                    n = len(ring)
                    for k, at in enumerate(ring):
                        if at not in shared:
                            continue
                        nb_in = sum(
                            1
                            for off in (-1, 1)
                            if ring[(k + off) % n] in shared
                        )
                        if nb_in == 1:
                            bridge.add(at)
    return len(spiro), len(bridge - spiro)


def sa_score(m) -> float:
    """Ertl-Schuffenhauer synthetic accessibility, 1 (easy) .. 10 (hard).

    Same computation as the reference sascorer
    (DiffPhar/analysis/SA_Score/sascorer.py:27-100): fragment term =
    count-weighted mean fragment score over the molecule's Morgan
    radius-<=2 environments (unknown fragments -4), minus size, stereo,
    spiro, bridgehead and macrocycle penalties, plus the symmetry
    correction, mapped to 1..10 with the same (-4, 2.5) affine transform
    and >8 log-squash. The fragment table comes from the embedded corpus
    (chem/sa_corpus.py) instead of the unshipped fpscores.pkl.gz —
    a documented deviation; values correlate with, but do not equal,
    RDKit's."""
    mol = _as_mol(m)
    if mol is None:
        return float("nan")
    n = mol.n_atoms
    if n == 0:
        return 10.0

    table = _sa_fragment_table()
    fps: Dict[int, int] = {}
    for e in atom_environments(mol):
        fps[e] = fps.get(e, 0) + 1
    nf = sum(fps.values())
    score1 = sum(table.get(e, -4.0) * c for e, c in fps.items()) / nf

    rings = mol.rings()
    n_macro = sum(1 for r in rings if len(r) > 8)
    n_spiro, n_bridge = _spiro_and_bridgeheads(rings)
    n_chiral = sum(
        1 for a in mol.atoms if getattr(a, "chirality", None)
    )
    size_penalty = n**1.005 - n
    stereo_penalty = math.log10(n_chiral + 1)
    spiro_penalty = math.log10(n_spiro + 1)
    bridge_penalty = math.log10(n_bridge + 1)
    macro_penalty = math.log10(2) if n_macro > 0 else 0.0
    score2 = -(
        size_penalty + stereo_penalty + spiro_penalty + bridge_penalty
        + macro_penalty
    )

    # symmetry correction (sascorer.py:83-86): repeated environments in
    # large molecules read as easier
    score3 = 0.0
    if n > len(fps):
        score3 = math.log(float(n) / len(fps)) * 0.5

    raw = score1 + score2 + score3
    lo, hi = -4.0, 2.5
    sascore = 11.0 - (raw - lo + 1.0) / (hi - lo) * 9.0
    if sascore > 8.0:
        sascore = 8.0 + math.log(sascore + 1.0 - 9.0)
    return float(min(10.0, max(1.0, sascore)))


# ------------------------------------------------------------- Lipinski

def lipinski(m) -> int:
    """Number of Lipinski rule-of-five criteria satisfied (0-5, including
    the logP<=5 Ghose variant as in metrics.py:196-208)."""
    mol = _as_mol(m)
    if mol is None:
        return 0
    rules = [
        mol.molecular_weight() <= 500,
        hbd(mol) <= 5,
        hba(mol) <= 10,
        crippen_logp(mol) <= 5,
        rotatable_bonds(mol) <= 10,
    ]
    return int(sum(rules))


# ------------------------------------------------------ fingerprints

def morgan_fingerprint(m, radius: int = 2, n_bits: int = 2048) -> Set[int]:
    """Hashed circular fingerprint (ECFP-like) as a set of on-bits.

    Built on the stable environment IDs of ``atom_environments`` so
    fingerprints are reproducible across processes (Python's hash() is
    salted)."""
    mol = _as_mol(m)
    if mol is None:
        return set()
    return set(e % n_bits for e in atom_environments(mol, radius))


def tanimoto(fp1: Set[int], fp2: Set[int]) -> float:
    if not fp1 and not fp2:
        return 1.0
    inter = len(fp1 & fp2)
    union = len(fp1) + len(fp2) - inter
    return inter / union if union else 0.0


def all_properties(smiles: str) -> Optional[Dict[str, float]]:
    """The 7-scalar GCPG condition vector + extras for one molecule."""
    mol = mol_from_smiles(smiles)
    if mol is None:
        return None
    return {
        "MW": mol.molecular_weight(),
        "logP": crippen_logp(mol),
        "QED": qed(mol),
        "SAS": sa_score(mol),
        "HBA": float(hba(mol)),
        "HBD": float(hbd(mol)),
        "RotaNumBonds": float(rotatable_bonds(mol)),
        "TPSA": tpsa(mol),
    }
