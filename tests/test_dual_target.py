"""Dual-target consensus modes (VERDICT r1 items 5 and 10).

Covers the per-molecule mode (point_dultarget_indiv.py: per-set GMM +
cross-set merging), the DBSCAN dual-target mode
(point_dultarget_DBSCAN.py:281-282), and the register_clouds size guard.
"""
import numpy as np
import pytest

from cmdgen_tpu.pipeline import get_phar as gp


def _rand_rotation(rng):
    a = rng.randn(3, 3)
    q, r = np.linalg.qr(a)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)


def _two_target_clouds(rng, n_per_site=40, noise=0.15):
    """Two sampled clouds sharing 4 consensus sites, cloud 1 in a rotated
    + translated frame."""
    sites = np.array(
        [[0, 0, 0], [4, 0, 0], [0, 4, 0], [2, 2, 3]], dtype=np.float32
    )
    fams = ["Aromatic", "Acceptor", "Donor", "Hydrophobe"]
    pts2, f2 = [], []
    for s, fam in zip(sites, fams):
        pts2.append(s + rng.randn(n_per_site, 3).astype(np.float32) * noise)
        f2 += [fam] * n_per_site
    c2 = np.concatenate(pts2)
    R = _rand_rotation(rng)
    t = np.array([5.0, -3.0, 2.0], dtype=np.float32)
    c1 = c2 @ R.T + t + rng.randn(len(c2), 3).astype(np.float32) * 0.02
    return c1, list(f2), c2, list(f2)


def test_register_clouds_positional_raises_on_unequal():
    rng = np.random.RandomState(0)
    c1 = rng.randn(20, 3).astype(np.float32)
    c2 = rng.randn(25, 3).astype(np.float32)
    with pytest.raises(ValueError, match="equal cloud sizes"):
        gp.register_clouds(c1, c2, mode="positional")


def test_register_clouds_icp_recovers_transform():
    """Unequal clouds: ICP registration recovers a known rigid motion on a
    structured (multi-site) cloud — the shape real sampled pharmacophore
    clouds have. (An isotropic Gaussian blob is ICP's degenerate worst case
    and not representative.)"""
    rng = np.random.RandomState(1)
    c1, _, base2, _ = _two_target_clouds(rng, n_per_site=20, noise=0.1)
    # make the clouds unequal: drop a quarter of cloud 1's points
    sel = rng.permutation(len(c1))[: 3 * len(c1) // 4]
    c1 = c1[sel]
    moved, r_est, t_est = gp.register_clouds(c1, base2, mode="icp")
    d = gp.nn_distances(moved, base2)
    assert float(np.median(d)) < 0.2, np.median(d)


def test_align_pharmacophores_exact():
    rng = np.random.RandomState(2)
    ref = rng.randn(10, 3).astype(np.float32)
    R = _rand_rotation(rng)
    probe = (ref - ref.mean(0)) @ R + ref.mean(0) + 1.0
    rmsd, r_est, t_est = gp.align_pharmacophores(ref, probe)
    assert rmsd < 1e-4
    with pytest.raises(ValueError):
        gp.align_pharmacophores(ref, probe[:5])


def test_merge_clusters_rules():
    def info(center, top, probs=None):
        p = probs or {top: 0.9, "Donor": 0.1}
        return {"center": np.asarray(center, np.float32), "probs": p,
                "top_family": top}

    # close pair (< threshold_merge) merges to the midpoint
    i1 = [info([0, 0, 0], "Acceptor")]
    i2 = [info([0.5, 0, 0], "Donor", {"Donor": 0.8, "Acceptor": 0.3})]
    merged = gp.merge_clusters(i1, i2, threshold_set2=4.0, threshold_merge=1.0)
    assert len(merged) == 1
    np.testing.assert_allclose(merged[0]["center"], [0.25, 0, 0])
    # per-family max probability
    assert merged[0]["probs"]["Acceptor"] == 0.9
    assert merged[0]["probs"]["Donor"] == 0.8

    # tolerant merge: Aromatic partner merges even at 3 A (>threshold_merge).
    # Reference quirk preserved (point_dultarget_indiv.py:412-420): the
    # midpoint lands 1.5 A from both parents — farther than threshold_merge —
    # so both parents are re-appended alongside the merged cluster.
    i1 = [info([0, 0, 0], "Hydrophobe")]
    i2 = [info([3.0, 0, 0], "Aromatic", {"Aromatic": 0.95})]
    merged = gp.merge_clusters(i1, i2, 4.0, 1.0)
    assert len(merged) == 3
    np.testing.assert_allclose(merged[0]["center"], [1.5, 0, 0])
    assert merged[0]["top_family"] == "Aromatic"

    # distant non-tolerant pair: both survive unmerged
    i1 = [info([0, 0, 0], "Acceptor")]
    i2 = [info([3.0, 0, 0], "Donor")]
    merged = gp.merge_clusters(i1, i2, 4.0, 1.0)
    assert len(merged) == 2

    # far beyond threshold_set2: never merged
    i2 = [info([10.0, 0, 0], "Aromatic")]
    merged = gp.merge_clusters(i1, i2, 4.0, 1.0)
    assert len(merged) == 2


def test_dual_target_indiv_end_to_end(tmp_path):
    rng = np.random.RandomState(3)
    c1, f1, c2, f2 = _two_target_clouds(rng)
    cons = gp.dual_target_consensus_indiv(
        c1, f1, c2, f2, n_clusters=4, overlap_threshold=1.5
    )
    assert len(cons) >= 4
    centers = np.stack([c for _, c in cons])
    # every true site should have a consensus point nearby (frame 2)
    sites = np.array([[0, 0, 0], [4, 0, 0], [0, 4, 0], [2, 2, 3]])
    d = np.sqrt(((sites[:, None] - centers[None]) ** 2).sum(-1)).min(axis=1)
    assert d.max() < 1.0, d
    types = {t for t, _ in cons}
    assert types <= {"AROM", "HACC", "HDON", "HYBL", "POSC", "LHYBL", "UNKNOWN"}
    gp.write_consensus(tmp_path / "indiv.posp", cons)
    text = (tmp_path / "indiv.posp").read_text()
    assert len(text.strip().splitlines()) == len(cons)


def test_dual_target_dbscan_mode():
    rng = np.random.RandomState(4)
    c1, f1, c2, f2 = _two_target_clouds(rng, n_per_site=50, noise=0.1)
    cons2, cons1 = gp.dual_target_consensus(
        c1, f1, c2, f2, method="dbscan", dbscan_eps=0.2, dbscan_min_samples=12
    )
    assert len(cons2) >= 3  # the dense sites survive as density clusters
    assert len(cons1) == len(cons2)
    sites = np.array([[0, 0, 0], [4, 0, 0], [0, 4, 0], [2, 2, 3]])
    centers = np.stack([c for _, c in cons2])
    d = np.sqrt(((centers[:, None] - sites[None]) ** 2).sum(-1)).min(axis=1)
    assert d.max() < 1.0


def test_dual_target_unknown_method():
    rng = np.random.RandomState(5)
    c1, f1, c2, f2 = _two_target_clouds(rng, n_per_site=10)
    with pytest.raises(ValueError, match="unknown dual-target method"):
        gp.dual_target_consensus(c1, f1, c2, f2, method="spectral")
