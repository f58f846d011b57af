"""Kabsch alignment, TPU clustering, consensus extraction."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.ops import clustering as cl
from cmdgen_tpu.ops.kabsch import aligned_rmsd, apply_rigid, kabsch, rmsd
from cmdgen_tpu.pipeline import get_phar as gp


def _rand_rot(rng):
    q, r = np.linalg.qr(rng.randn(3, 3))
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def test_kabsch_recovers_rigid_transform():
    rng = np.random.RandomState(0)
    p = rng.randn(20, 3).astype(np.float32)
    r_true = _rand_rot(rng).astype(np.float32)
    t_true = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    q = p @ r_true.T + t_true
    r, t = kabsch(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)
    assert float(aligned_rmsd(jnp.asarray(p), jnp.asarray(q))) < 1e-4


def test_kabsch_no_reflection():
    rng = np.random.RandomState(1)
    p = rng.randn(10, 3).astype(np.float32)
    q = p.copy()
    q[:, 0] = -q[:, 0]  # mirrored — cannot be matched by proper rotation
    r, t = kabsch(jnp.asarray(p), jnp.asarray(q))
    assert float(jnp.linalg.det(r)) == pytest.approx(1.0, abs=1e-4)


def test_kmeans_separated_blobs():
    rng = np.random.RandomState(2)
    blobs = np.concatenate(
        [rng.randn(50, 3) * 0.2 + c for c in [[0, 0, 0], [5, 0, 0], [0, 5, 0]]]
    ).astype(np.float32)
    res = cl.kmeans(jax.random.PRNGKey(0), jnp.asarray(blobs), 3)
    centers = np.sort(np.asarray(res.centers), axis=0)
    expected = np.sort(np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0]]), axis=0)
    np.testing.assert_allclose(centers, expected, atol=0.3)


def test_gmm_fits_blobs_and_proba_normalized():
    rng = np.random.RandomState(3)
    blobs = np.concatenate(
        [rng.randn(80, 3) * 0.3 + c for c in [[0, 0, 0], [6, 0, 0]]]
    ).astype(np.float32)
    g = cl.gmm_fit(jax.random.PRNGKey(1), jnp.asarray(blobs), 2, iters=50)
    means = np.sort(np.asarray(g.means)[:, 0])
    np.testing.assert_allclose(means, [0, 6], atol=0.3)
    proba = np.asarray(cl.gmm_predict_proba(g, jnp.asarray(blobs)))
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-4)
    assert proba.shape == (160, 2)


def test_dbscan_blobs_and_noise():
    rng = np.random.RandomState(4)
    blobs = np.concatenate(
        [
            rng.randn(30, 3).astype(np.float32) * 0.1 + np.array([0, 0, 0]),
            rng.randn(30, 3).astype(np.float32) * 0.1 + np.array([5, 5, 5]),
            np.array([[20.0, 20.0, 20.0]]),  # lone noise point
        ]
    )
    labels = np.asarray(cl.dbscan(jnp.asarray(blobs), eps=1.0, min_samples=5))
    assert labels[-1] == -1
    assert len(set(labels[:30])) == 1 and len(set(labels[30:60])) == 1
    assert labels[0] != labels[30]


def test_consensus_pipeline(tmp_path):
    rng = np.random.RandomState(5)
    # two synthetic "sampled pharmacophore" sites with known types
    data = {}
    for i in range(40):
        data[f"Molecule_{i}"] = {
            "Aromatic": [(rng.randn(3) * 0.3 + [0, 0, 0]).tolist()],
            "Acceptor": [(rng.randn(3) * 0.3 + [6, 0, 0]).tolist()],
        }
    p = tmp_path / "cloud.json"
    p.write_text(json.dumps(data))
    coords, fams = gp.load_point_cloud_json(p)
    assert coords.shape == (80, 3)
    cons = gp.consensus_gmm(coords, fams, n_clusters=2, seed=0)
    types = {t for t, _ in cons}
    assert types == {"AROM", "HACC"}
    # centers near the blob centers
    centers = np.stack([c for _, c in cons])
    assert np.min(np.abs(centers[:, 0] - 0)) < 0.5
    assert np.min(np.abs(centers[:, 0] - 6)) < 0.5
    out = tmp_path / "out.posp"
    gp.write_consensus(out, cons)
    from cmdgen_tpu.chem.posp import load_phar_file

    pp_h, pp_e, mask = load_phar_file(out)
    assert int(mask.sum()) == 2


def test_dual_target_and_selectivity():
    rng = np.random.RandomState(6)
    shared = rng.randn(60, 3).astype(np.float32) * 0.3
    extra1 = rng.randn(25, 3).astype(np.float32) * 0.3 + np.array([8, 0, 0])
    c1 = np.concatenate([shared, extra1])
    f1 = ["Aromatic"] * 60 + ["Donor"] * 25
    # target 2 = rigid-transformed shared region
    r = _rand_rot(rng).astype(np.float32)
    t = np.array([2.0, 1.0, -1.0], dtype=np.float32)
    c2 = shared @ r.T + t
    f2 = ["Aromatic"] * 60

    cons2, cons1 = gp.dual_target_consensus(
        c1[:60], f1[:60], c2, f2, n_clusters=1, seed=0
    )
    assert cons2[0][0] == "AROM"
    # selectivity: extra1 sticks out relative to the shared cloud
    sel = gp.selective_consensus(c1, f1, shared, eps=1.0, min_samples=5)
    assert any(t == "HDON" for t, _ in sel)
