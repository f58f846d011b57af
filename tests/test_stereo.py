"""Stereochemistry in the chem core (VERDICT r1 item 6).

Tetrahedral chirality (@/@@) and double-bond E/Z (/ \\) must survive
parsing, canonicalization, and random-SMILES augmentation — the behavior
the reference gets from RDKit isomeric SMILES (GCPG/utils/dataset.py:
201-208; ChEMBL training data is stereo-rich).
"""
import random

import pytest

from cmdgen_tpu.chem.mol import (
    canonical_smiles,
    mol_from_smiles,
    parse_smiles,
    random_smiles,
)
from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs

STEREO_SMILES = [
    "C[C@H](N)C(=O)O",
    "C[C@@H](N)C(=O)O",
    "N[C@@H](Cc1ccccc1)C(=O)O",
    "[C@H](F)(Cl)Br",
    "C[C@](F)(Cl)Br",
    "O[C@H]1CC[C@@H](N)CC1",
    "O[C@H]1CC[C@H](N)CC1",
    "F/C=C/F",
    "F/C=C\\F",
    "C/C=C/C=C/C",
    "CC/C=C(/C)CO",
]


@pytest.mark.parametrize("smi", STEREO_SMILES)
def test_canonical_roundtrip_is_stable(smi):
    c1 = canonical_smiles(smi)
    assert c1 is not None
    assert canonical_smiles(c1) == c1  # idempotent
    # stereo markers survive
    if "@" in smi:
        assert "@" in c1
    if "/" in smi or "\\" in smi:
        assert "/" in c1 or "\\" in c1


@pytest.mark.parametrize("smi", STEREO_SMILES)
def test_random_smiles_preserve_stereo(smi):
    c1 = canonical_smiles(smi)
    for seed in range(10):
        r = random_smiles(smi, random.Random(seed))
        assert r is not None
        assert canonical_smiles(r) == c1, (seed, r)


def test_stereoisomers_are_distinct():
    pairs = [
        ("C[C@H](N)C(=O)O", "C[C@@H](N)C(=O)O"),
        ("F/C=C/F", "F/C=C\\F"),
        ("O[C@H]1CC[C@@H](N)CC1", "O[C@H]1CC[C@H](N)CC1"),
        ("C[C@H](N)C(=O)O", "CC(N)C(=O)O"),  # chiral vs flat
    ]
    for a, b in pairs:
        ca, cb = canonical_smiles(a), canonical_smiles(b)
        assert ca is not None and cb is not None
        assert ca != cb, (a, b, ca)


def test_equivalent_writings_collide():
    """Different input writings of the SAME stereoisomer canonicalize
    identically (what uniqueness/novelty metrics rely on)."""
    same = [
        ("C[C@@H](N)C(=O)O", "N[C@H](C)C(=O)O"),
        ("F/C=C/F", "F\\C=C\\F"),
        ("F/C=C\\F", "F\\C=C/F"),
    ]
    for a, b in same:
        assert canonical_smiles(a) == canonical_smiles(b), (a, b)


def test_parity_storage_is_order_independent():
    m1 = parse_smiles("C[C@H](N)O")
    m2 = parse_smiles("C[C@@H](O)N")  # same stereoisomer, swapped branches
    assert m1.atoms[1].chirality is not None
    assert m2.atoms[1].chirality is not None


def test_bond_stereo_parsed():
    m = parse_smiles("F/C=C/F")
    dbl = [b for b in m.bonds if b.order == 2][0]
    assert dbl.stereo is not None
    x, y, cis = dbl.stereo
    assert not cis  # trans
    m = parse_smiles("F/C=C\\F")
    dbl = [b for b in m.bonds if b.order == 2][0]
    assert dbl.stereo[2]  # cis


def test_undefined_chirality_dropped():
    # 2 identical H slots / too few distinct neighbors: tag is dropped
    m = mol_from_smiles("[C@H2](C)C")  # only 2 heavy nbrs + 2 H
    if m is not None:
        assert all(a.chirality is None for a in m.atoms)
    # exotic tags parse but drop stereo
    m = mol_from_smiles("C[C@SP1](F)(Cl)Br")
    if m is not None:
        assert all(a.chirality is None for a in m.atoms)


def test_tokenizer_roundtrip_with_stereo():
    vocab = gen_vocabs(STEREO_SMILES)
    tok = Tokenizer(vocab)
    for smi in STEREO_SMILES:
        ids = tok.parse(smi)
        back = tok.get_text([ids[1:]])[0]  # strip <sos>
        assert back == smi, (smi, back)


def test_achiral_unaffected():
    # canonicalization of achiral molecules is unchanged by the stereo path
    for smi in ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1"]:
        c = canonical_smiles(smi)
        assert c is not None and "@" not in c and "/" not in c
