"""Descriptor sanity: known reference values (PubChem/RDKit) within coarse
tolerance for the approximated ones, exact for counts."""
import math

import pytest

from cmdgen_tpu.chem import descriptors as d
from cmdgen_tpu.chem import metrics as m

ASPIRIN = "CC(=O)Oc1ccccc1C(=O)O"
CAFFEINE = "Cn1cnc2c1c(=O)n(C)c(=O)n2C"
IBUPROFEN = "CC(C)Cc1ccc(C(C)C(=O)O)cc1"


def test_h_bond_counts():
    assert d.hba(ASPIRIN) == 4      # 4 oxygens
    assert d.hbd(ASPIRIN) == 1      # the acid OH
    assert d.hba(CAFFEINE) == 6     # 4 N + 2 O
    assert d.hbd(CAFFEINE) == 0


def test_rotatable_bonds():
    assert d.rotatable_bonds("CCCC") == 1
    assert d.rotatable_bonds("c1ccccc1") == 0
    assert d.rotatable_bonds(ASPIRIN) == 3  # PubChem reports 3
    assert d.rotatable_bonds("CC(=O)NC") == 0  # amide excluded


def test_tpsa_close_to_reference():
    # RDKit/PubChem TPSA: aspirin 63.6, caffeine 58.4 (coarse table: ±20%)
    assert abs(d.tpsa(ASPIRIN) - 63.6) / 63.6 < 0.2
    assert abs(d.tpsa(CAFFEINE) - 58.4) / 58.4 < 0.35


def test_logp_ordering():
    """Approximate logP must at least order hydrophobicity correctly."""
    lp = d.crippen_logp
    assert lp("CCCCCCCC") > lp("CCO") > lp("OCC(O)CO")
    assert lp(IBUPROFEN) > lp(CAFFEINE)


def test_qed_in_range_and_druglike_higher():
    q_drug = d.qed(IBUPROFEN)
    q_ugly = d.qed("C" * 40)  # C40 alkane
    assert 0 < q_ugly < q_drug <= 1.0


def test_sa_score_range_and_ordering():
    easy = d.sa_score("CCO")
    hard = d.sa_score("C1CC2CC1C1C3CC(C1)C23")  # polycyclic cage-like
    assert 1 <= easy < hard <= 10


def test_lipinski():
    assert d.lipinski(ASPIRIN) == 5
    assert d.lipinski("C" * 60) < 5  # MW + logP violations


def test_fingerprint_tanimoto():
    f1 = d.morgan_fingerprint(ASPIRIN)
    f2 = d.morgan_fingerprint(ASPIRIN)
    f3 = d.morgan_fingerprint(CAFFEINE)
    assert d.tanimoto(f1, f2) == 1.0
    assert d.tanimoto(f1, f3) < 0.5


def test_metrics_chain():
    gen = [ASPIRIN, ASPIRIN, CAFFEINE, "C1CC", "CC(C)Cc1ccc(C(C)C(=O)O)cc1"]
    out = m.evaluate_set(gen, train_set={m.canonical_smiles(ASPIRIN)})
    assert out["validity"] == pytest.approx(0.8)
    assert out["uniqueness"] == pytest.approx(3 / 4)
    assert out["novelty"] == pytest.approx(2 / 3)
    assert 0 < out["qed"] < 1
    assert 0 < out["diversity"] <= 1


def test_categorical_kl():
    import numpy as np

    h = np.array([10, 20, 30])
    assert m.categorical_kl(h, h) == pytest.approx(0.0, abs=1e-9)
    assert m.categorical_kl(np.array([1, 0, 0]), np.array([0, 0, 1])) > 1.0


def test_all_properties_vector():
    p = d.all_properties(ASPIRIN)
    assert set(p) >= {"MW", "logP", "QED", "SAS", "HBA", "HBD", "RotaNumBonds"}
    assert abs(p["MW"] - 180.16) < 0.1
    assert d.all_properties("C1CC") is None
