"""Feature perception, pp-graph construction, posp IO, match scoring."""
import random

import numpy as np
import pytest

from cmdgen_tpu.chem.features import get_features
from cmdgen_tpu.chem.match import get_match_scores, match_score
from cmdgen_tpu.chem.mol import mol_from_smiles
from cmdgen_tpu.chem.posp import load_phar_file, save_posp
from cmdgen_tpu.chem.ppgraph import (
    bond_path_dist,
    sample_probability,
    smiles_to_ppgraph,
)


def _families(smiles):
    return {f for f, _ in get_features(mol_from_smiles(smiles))}


def test_feature_perception_basics():
    assert "Aromatic" in _families("c1ccccc1")
    assert "Donor" in _families("CCO") and "Acceptor" in _families("CCO")
    assert "NegIonizable" in _families("CC(=O)O")
    assert "PosIonizable" in _families("CCN")        # basic amine
    assert "PosIonizable" in _families("NC(N)=N")    # guanidine
    assert "Hydrophobe" in _families("CCCC")
    assert "LumpedHydrophobe" in _families("C1CCCCC1")
    assert "NegIonizable" in _families("c1nnn[nH]1")  # tetrazole
    # amide N must not be an acceptor or posionizable
    fams_amide = get_features(mol_from_smiles("CC(=O)NC"))
    n_feats = [f for f, atoms in fams_amide if f in ("Acceptor", "PosIonizable")]
    # the only acceptor should be the carbonyl O (atom id of O is 2)
    for f, atoms in fams_amide:
        if f == "Acceptor":
            assert mol_from_smiles("CC(=O)NC").atoms[atoms[0]].symbol == "O"


def test_bond_path_dist():
    m = mol_from_smiles("CCCC")  # three single bonds
    assert bond_path_dist(m, 0, 3) == pytest.approx(3.0)
    m = mol_from_smiles("C=CC")  # double + single
    assert bond_path_dist(m, 0, 2) == pytest.approx(0.87 + 1.0)
    m = mol_from_smiles("c1ccccc1")  # aromatic ring: 0->3 via 3 aromatic bonds
    assert bond_path_dist(m, 0, 3) == pytest.approx(3 * 0.91)


def test_sample_probability_distribution():
    rng = random.Random(0)
    vals = sample_probability([3, 4, 5, 6, 7], [0.086, 0.0864, 0.389, 0.495, 0.0273],
                              5000, rng)
    freq = {v: vals.count(v) / 5000 for v in [3, 4, 5, 6, 7]}
    assert abs(freq[6] - 0.472) < 0.08  # mode respected (normalized ~0.472)
    assert freq[7] < 0.08


def test_smiles_to_ppgraph_shapes():
    rng = random.Random(1)
    out = smiles_to_ppgraph("CC(=O)Oc1ccccc1C(=O)O", rng)
    assert out is not None
    pp_h, pp_e, mask, mapping = out
    assert pp_h.shape == (8, 8) and pp_e.shape == (8, 8, 1)
    k = int(mask.sum())
    assert 1 <= k <= 8
    # valid nodes have at least one type bit and size >= 1
    assert (pp_h[:k, :7].sum(axis=1) >= 1).all()
    assert (pp_h[:k, 7] >= 1).all()
    # distances symmetric, zero diagonal
    np.testing.assert_allclose(pp_e[..., 0], pp_e[..., 0].T)
    # mapping rows refer to real atoms
    assert mapping.shape[1] == 8
    assert mapping.sum() > 0


def test_posp_roundtrip(tmp_path):
    p = tmp_path / "test.posp"
    save_posp(
        p,
        ["AROM", "HACC", "HDON"],
        np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [0.0, 4.0, 0.0]]),
    )
    pp_h, pp_e, mask = load_phar_file(p)
    assert int(mask.sum()) == 3
    # AROM -> bit 0, HACC -> bit 3, HDON -> bit 4
    assert pp_h[0, 0] == 1 and pp_h[1, 3] == 1 and pp_h[2, 4] == 1
    # distance 0-1: 3 Å euclidean -> 3*1.06068655-0.43105129
    assert pp_e[0, 1, 0] == pytest.approx(3 * 1.06068655 - 0.43105129, abs=1e-4)


def test_match_score_self_consistency():
    """A molecule matched against its own pharmacophore graph scores high."""
    rng = random.Random(2)
    smiles = "CC(=O)Oc1ccccc1C(=O)O"
    pp_h, pp_e, mask, _ = smiles_to_ppgraph(smiles, rng)
    s = match_score(smiles, pp_h, pp_e, mask)
    assert s >= 0.6, s


def test_match_score_invalid():
    rng = random.Random(3)
    pp_h, pp_e, mask, _ = smiles_to_ppgraph("CCO", rng)
    assert match_score("C1CC", pp_h, pp_e, mask) == -1.0


def test_get_match_scores_pool():
    rng = random.Random(4)
    g = smiles_to_ppgraph("CCOc1ccccc1", rng)[:3]
    scores = get_match_scores([g, g], ["CCOc1ccccc1", "not_a_smiles"], n_workers=2)
    assert scores[0] >= 0.0
    assert scores[1] == -1.0


def test_native_bond_dist_matches_python_fallback():
    """csrc/chemops.cpp must agree exactly with the pure-Python BFS on the
    all-pairs weighted bond-path matrix (incl. disconnected pairs = 100).
    Skipped only if the toolchain can't build the library."""
    from cmdgen_tpu.chem import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native chemops unavailable (no toolchain)")
    for smi in ["CCCC", "C=CC", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O",
                "CCO.CCN"]:  # last: disconnected components
        m = mol_from_smiles(smi)
        got = native.all_pairs_bond_dist(m)
        native._LIB = None  # force the Python BFS fallback
        native._TRIED = True
        try:
            want = native.all_pairs_bond_dist(m)
        finally:
            native._LIB = lib  # restore for other tests
        np.testing.assert_allclose(got, want, atol=1e-5), smi
