"""Consensus pharmacophore extraction from sampled point clouds.

Behavioral equivalent of DiffPhar/get_phar/: pool the pharmacophore points
sampled for a pocket (the JSON emitted by the sampling stage), cluster them
(GMM / KMeans / DBSCAN), assign each cluster its most probable feature type,
and write a ``.posp`` hypothesis. Includes the dual-target mode (Kabsch
registration of one target's cloud onto another + mutual-overlap extraction,
point_dultarget.py) and the selectivity mode (points distant from the
anti-target cloud, point_select.py). Clustering runs on TPU
(ops/clustering.py) instead of sklearn; nearest-neighbor distances replace
open3d.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem.posp import FAMILY2POSP, save_posp
from cmdgen_tpu.ops.clustering import (
    dbscan,
    gmm_fit,
    gmm_predict_proba,
    kmeans,
)
from cmdgen_tpu.ops.kabsch import apply_rigid, kabsch


def load_point_cloud_json(path) -> Tuple[np.ndarray, List[str]]:
    """Parse the sampling stage's JSON ({Molecule_i: {family: [xyz...]}},
    generate_phars.py:49-60) into flat (coords [N,3], family names [N])."""
    data = json.loads(Path(path).read_text())
    coords, families = [], []
    for _mol, feats in data.items():
        for fam, pts in feats.items():
            for p in pts:
                coords.append(p)
                families.append(fam)
    return np.asarray(coords, dtype=np.float32), families


def _cluster_feature_types(
    resp: np.ndarray, families: Sequence[str], n_clusters: int
) -> List[str]:
    """Most probable feature per cluster from summed responsibilities
    (GMM_json.py:40-120: per-family responsibility sums, normalized per
    family, argmax per cluster)."""
    fam_set = sorted(set(families))
    probs = {f: np.zeros(n_clusters) for f in fam_set}
    for i, f in enumerate(families):
        probs[f] += resp[i]
    for f in fam_set:
        s = probs[f].sum()
        if s > 0:
            probs[f] = probs[f] / s
    out = []
    for c in range(n_clusters):
        best = max(fam_set, key=lambda f: probs[f][c])
        out.append(best)
    return out


def consensus_gmm(
    coords: np.ndarray,
    families: Sequence[str],
    n_clusters: int = 7,
    seed: int = 42,
) -> List[Tuple[str, np.ndarray]]:
    """GMM consensus (GMM_json.py). Returns [(posp type code, center xyz)]."""
    x = jnp.asarray(coords)
    g = gmm_fit(jax.random.PRNGKey(seed), x, n_clusters)
    resp = np.asarray(gmm_predict_proba(g, x))
    types = _cluster_feature_types(resp, families, n_clusters)
    centers = np.asarray(g.means)
    return [
        (FAMILY2POSP.get(t, "UNKNOWN"), centers[c])
        for c, t in enumerate(types)
    ]


def consensus_kmeans(
    coords: np.ndarray,
    families: Sequence[str],
    n_clusters: int = 7,
    seed: int = 42,
) -> List[Tuple[str, np.ndarray]]:
    """KMeans consensus (kmeans_json.py): hard counts per cluster."""
    x = jnp.asarray(coords)
    km = kmeans(jax.random.PRNGKey(seed), x, n_clusters)
    labels = np.asarray(km.labels)
    resp = np.eye(n_clusters, dtype=np.float32)[labels]
    types = _cluster_feature_types(resp, families, n_clusters)
    centers = np.asarray(km.centers)
    return [
        (FAMILY2POSP.get(t, "UNKNOWN"), centers[c])
        for c, t in enumerate(types)
    ]


def consensus_dbscan(
    coords: np.ndarray,
    families: Sequence[str],
    eps: float = 0.2,
    min_samples: int = 12,
) -> List[Tuple[str, np.ndarray]]:
    """DBSCAN consensus (point_dultarget_DBSCAN.py:281-300): clusters are
    density regions; noise (-1) is dropped."""
    labels = np.asarray(dbscan(jnp.asarray(coords), eps, min_samples))
    out = []
    for lab in sorted(set(labels.tolist()) - {-1}):
        idx = np.where(labels == lab)[0]
        fams = [families[i] for i in idx]
        best = max(set(fams), key=fams.count)
        center = coords[idx].mean(axis=0)
        out.append((FAMILY2POSP.get(best, "UNKNOWN"), center))
    return out


def cluster_report(
    coords: np.ndarray,
    families: Sequence[str],
    n_clusters: int = 7,
    seed: int = 42,
) -> List[Dict[str, object]]:
    """Per-cluster frequency/probability report (GMM_json_indiv.py):
    [{center, counts per family, probs per family, top_family}]."""
    x = jnp.asarray(coords)
    g = gmm_fit(jax.random.PRNGKey(seed), x, n_clusters)
    resp = np.asarray(gmm_predict_proba(g, x))
    labels = resp.argmax(axis=1)
    fam_set = sorted(set(families))
    report = []
    for c in range(n_clusters):
        counts = {f: 0 for f in fam_set}
        probs = {f: 0.0 for f in fam_set}
        for i, f in enumerate(families):
            probs[f] += float(resp[i, c])
            if labels[i] == c:
                counts[f] += 1
        top = max(fam_set, key=lambda f: probs[f])
        report.append(
            {
                "center": np.asarray(g.means)[c].tolist(),
                "counts": counts,
                "probs": probs,
                "top_family": top,
            }
        )
    return report


def write_consensus(path, consensus: List[Tuple[str, np.ndarray]]):
    types = [t for t, _ in consensus]
    centers = np.stack([c for _, c in consensus])
    save_posp(path, types, centers)


# ------------------------------------------------------------- dual target

def nn_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """For each point in a, distance to its nearest neighbor in b (the
    open3d compute_point_cloud_distance replacement), computed on device."""
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)
    d2 = jnp.sum((a_j[:, None, :] - b_j[None, :, :]) ** 2, axis=-1)
    return np.asarray(jnp.sqrt(jnp.min(d2, axis=1)))


def register_clouds(c1: np.ndarray, c2: np.ndarray):
    """Kabsch-register cloud 1 onto cloud 2 (point_dultarget.py:84-87).
    The reference relies on positional correspondence of equally sized
    clouds; unequal clouds are truncated to the common length."""
    n = min(len(c1), len(c2))
    r, t = kabsch(jnp.asarray(c1[:n]), jnp.asarray(c2[:n]))
    moved = np.asarray(apply_rigid(r, t, jnp.asarray(c1)))
    return moved, np.asarray(r), np.asarray(t)


def inverse_transform(coords: np.ndarray, r: np.ndarray, t: np.ndarray):
    return (coords - t) @ np.linalg.inv(r).T


def dual_target_consensus(
    coords1: np.ndarray,
    families1: Sequence[str],
    coords2: np.ndarray,
    families2: Sequence[str],
    overlap_threshold: float = 1.5,
    n_clusters: int = 7,
    seed: int = 42,
):
    """Dual-target mode (point_dultarget.py): register target-1 points onto
    target-2, keep mutually overlapping points (< threshold to the other
    cloud), GMM-cluster the merged overlap, and return the consensus in both
    frames: (consensus_frame2, consensus_frame1)."""
    moved1, r, t = register_clouds(coords1, coords2)
    d1 = nn_distances(moved1, coords2)
    d2 = nn_distances(coords2, moved1)
    keep1 = d1 < overlap_threshold
    keep2 = d2 < overlap_threshold
    merged = np.concatenate([moved1[keep1], coords2[keep2]], axis=0)
    fams = [f for f, k in zip(families1, keep1) if k] + [
        f for f, k in zip(families2, keep2) if k
    ]
    if len(merged) < n_clusters:
        raise ValueError(
            f"only {len(merged)} overlapping points for {n_clusters} clusters"
        )
    cons2 = consensus_gmm(merged, fams, n_clusters, seed)
    cons1 = [
        (tname, inverse_transform(center[None], r, t)[0])
        for tname, center in cons2
    ]
    return cons2, cons1


def selective_consensus(
    coords1: np.ndarray,
    families1: Sequence[str],
    coords2: np.ndarray,
    distance_threshold: float = 1.0,
    eps: float = 0.8,
    min_samples: int = 5,
):
    """Selectivity mode (point_select.py:68-127): keep target-1 points
    farther than the threshold from the anti-target cloud, then DBSCAN them
    into selective pharmacophore sites."""
    d = nn_distances(coords1, coords2)
    keep = d > distance_threshold
    pts = coords1[keep]
    fams = [f for f, k in zip(families1, keep) if k]
    if len(pts) == 0:
        return []
    return consensus_dbscan(pts, fams, eps=eps, min_samples=min_samples)
