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
    standardize: bool = False,
) -> List[Tuple[str, np.ndarray]]:
    """DBSCAN consensus (point_dultarget_DBSCAN.py:281-300): clusters are
    density regions; noise (-1) is dropped.

    ``standardize`` reproduces the reference's StandardScaler step
    (point_dultarget_DBSCAN.py:279-282): clustering runs on per-axis
    z-scored coordinates, so eps=0.2 is in scaled units, not Angstrom.
    Cluster centers are reported as the mean of the member points in the
    *original* frame (the reference keeps the first member's scaled coords
    — a quirk we deliberately do not replicate, see PARITY.md)."""
    pts = np.asarray(coords, dtype=np.float32)
    if standardize:
        mu = pts.mean(axis=0)
        sd = pts.std(axis=0)
        scaled = (pts - mu) / np.maximum(sd, 1e-9)
    else:
        scaled = pts
    labels = np.asarray(dbscan(jnp.asarray(scaled), eps, min_samples))
    out = []
    for lab in sorted(set(labels.tolist()) - {-1}):
        idx = np.where(labels == lab)[0]
        fams = [families[i] for i in idx]
        best = max(set(fams), key=fams.count)
        center = pts[idx].mean(axis=0)
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


def align_pharmacophores(ref: np.ndarray, probe: np.ndarray):
    """Least-squares rigid alignment of corresponding point sets
    (point_dultarget_indiv.py:112-146: centroid pre-shift +
    rdAlignment.GetAlignmentTransform). Returns (rmsd, R, t) with
    probe @ R.T + t ~= ref."""
    if len(ref) != len(probe):
        raise ValueError(
            f"align_pharmacophores needs corresponding point sets, got "
            f"{len(ref)} vs {len(probe)}"
        )
    r, t = kabsch(jnp.asarray(probe), jnp.asarray(ref))
    moved = apply_rigid(r, t, jnp.asarray(probe))
    val = float(jnp.sqrt(jnp.mean(jnp.sum((moved - jnp.asarray(ref)) ** 2, -1))))
    return val, np.asarray(r), np.asarray(t)


def register_clouds(c1: np.ndarray, c2: np.ndarray, mode: str = "auto",
                    icp_iters: int = 20):
    """Kabsch-register cloud 1 onto cloud 2 (point_dultarget.py:84-87).

    mode:
      - 'positional': the reference's behavior — positional correspondence;
        requires equal sizes (raises otherwise; the silent truncation of
        round 1 mis-registered unequal clouds).
      - 'icp': nearest-neighbor correspondence refined iteratively; works
        for unequal sizes.
      - 'auto': positional when sizes match, icp otherwise.
    """
    c1 = np.asarray(c1, dtype=np.float32)
    c2 = np.asarray(c2, dtype=np.float32)
    if mode == "auto":
        mode = "positional" if len(c1) == len(c2) else "icp"
    if mode == "positional":
        if len(c1) != len(c2):
            raise ValueError(
                f"positional registration needs equal cloud sizes, got "
                f"{len(c1)} vs {len(c2)}; use mode='icp'"
            )
        r, t = kabsch(jnp.asarray(c1), jnp.asarray(c2))
        moved = np.asarray(apply_rigid(r, t, jnp.asarray(c1)))
        return moved, np.asarray(r), np.asarray(t)
    if mode != "icp":
        raise ValueError(f"unknown registration mode {mode!r}")
    # Multi-start ICP: principal-axes initializations (the 4 proper sign
    # combinations) guard against the local minima a bare centroid init
    # falls into; each start iterates nearest-neighbor Kabsch.
    mu1, mu2 = c1.mean(axis=0), c2.mean(axis=0)
    _, v1 = np.linalg.eigh(np.cov((c1 - mu1).T))
    _, v2 = np.linalg.eigh(np.cov((c2 - mu2).T))
    starts = [np.eye(3, dtype=np.float32)]
    for s in [(1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1)]:
        r0 = v2 @ np.diag(s).astype(np.float64) @ v1.T
        if np.linalg.det(r0) < 0:
            r0 = -r0
        starts.append(r0.astype(np.float32))
    # deterministic random restarts: near-spherical clouds have degenerate
    # principal axes, so PCA inits alone can all share one basin
    rs = np.random.RandomState(0)
    for _ in range(40):
        q, r = np.linalg.qr(rs.randn(3, 3))
        q = q @ np.diag(np.sign(np.diag(r)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        starts.append(q.astype(np.float32))
    scale = float(np.sqrt(((c2 - mu2) ** 2).sum(-1).mean()))

    best = None
    for r0 in starts:
        moved = (c1 - mu1) @ r0.T + mu2
        r_i = r0
        t_i = mu2 - r0 @ mu1
        for _ in range(icp_iters):
            d2 = ((moved[:, None, :] - c2[None, :, :]) ** 2).sum(-1)
            nn = d2.argmin(axis=1)
            r_i, t_i = kabsch(jnp.asarray(c1), jnp.asarray(c2[nn]))
            new_moved = np.asarray(apply_rigid(r_i, t_i, jnp.asarray(c1)))
            if np.allclose(new_moved, moved, atol=1e-6):
                moved = new_moved
                break
            moved = new_moved
        score = float(np.mean(nn_distances(moved, c2)))
        if best is None or score < best[0]:
            best = (score, moved, np.asarray(r_i), np.asarray(t_i))
        if best[0] < 1e-3 * scale:  # essentially exact — stop searching
            break
    return best[1], best[2], best[3]


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
    method: str = "gmm",
    dbscan_eps: float = 0.2,
    dbscan_min_samples: int = 12,
):
    """Dual-target mode (point_dultarget.py): register target-1 points onto
    target-2, keep mutually overlapping points (< threshold to the other
    cloud), cluster the merged overlap, and return the consensus in both
    frames: (consensus_frame2, consensus_frame1).

    ``method`` selects the consensus clusterer: 'gmm' (point_dultarget.py:
    216-252) or 'dbscan' (point_dultarget_DBSCAN.py:281-282, standardized
    coordinates)."""
    moved1, r, t = register_clouds(coords1, coords2)
    d1 = nn_distances(moved1, coords2)
    d2 = nn_distances(coords2, moved1)
    keep1 = d1 < overlap_threshold
    keep2 = d2 < overlap_threshold
    merged = np.concatenate([moved1[keep1], coords2[keep2]], axis=0)
    fams = [f for f, k in zip(families1, keep1) if k] + [
        f for f, k in zip(families2, keep2) if k
    ]
    if method == "gmm":
        if len(merged) < n_clusters:
            raise ValueError(
                f"only {len(merged)} overlapping points for {n_clusters} clusters"
            )
        cons2 = consensus_gmm(merged, fams, n_clusters, seed)
    elif method == "dbscan":
        # point_dultarget_DBSCAN.py:279-282: StandardScaler + DBSCAN(0.2, 12)
        cons2 = consensus_dbscan(
            merged, fams, eps=dbscan_eps, min_samples=dbscan_min_samples,
            standardize=True,
        )
    else:
        raise ValueError(f"unknown dual-target method {method!r}")
    cons1 = [
        (tname, inverse_transform(center[None], r, t)[0])
        for tname, center in cons2
    ]
    return cons2, cons1


def cluster_info_gmm(
    coords: np.ndarray,
    families: Sequence[str],
    n_clusters: int = 7,
    seed: int = 42,
) -> List[Dict[str, object]]:
    """Per-set GMM cluster descriptors for the per-molecule dual-target
    mode (point_dultarget_indiv.py:266-352): each cluster carries its
    center, per-family responsibility-sum probabilities (normalized per
    family over clusters, as the reference does), and top family."""
    x = jnp.asarray(coords)
    g = gmm_fit(jax.random.PRNGKey(seed), x, n_clusters)
    resp = np.asarray(gmm_predict_proba(g, x))
    fam_set = sorted(set(families))
    probs = {f: np.zeros(n_clusters) for f in fam_set}
    for i, f in enumerate(families):
        probs[f] += resp[i]
    for f in fam_set:
        s = probs[f].sum()
        if s > 0:
            probs[f] = probs[f] / s
    centers = np.asarray(g.means)
    info = []
    for c in range(n_clusters):
        top = max(fam_set, key=lambda f: probs[f][c])
        info.append(
            {
                "center": centers[c],
                "probs": {f: float(probs[f][c]) for f in fam_set},
                "top_family": top,
            }
        )
    return info


def merge_clusters(
    info1: List[Dict[str, object]],
    info2: List[Dict[str, object]],
    threshold_set2: float = 4.0,
    threshold_merge: float = 1.0,
) -> List[Dict[str, object]]:
    """Cross-set cluster merging (point_dultarget_indiv.py:361-420).

    For each set-1 cluster, find its nearest set-2 cluster; merge them when
    they are within ``threshold_set2`` AND either the set-2 partner's top
    family is aromatic/lumped-hydrophobic (tolerant merge for bulky
    features) or the distance is under ``threshold_merge``. A merged
    cluster sits at the midpoint, takes the per-family max probability
    (plus set-1-unique families), and its top family is whichever of the
    two tops has the higher combined probability. Unmerged clusters from
    either set are appended unless they fall within ``threshold_merge`` of
    an already-merged center.
    """

    def _dist(a, b):
        return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))

    merged: List[Dict[str, object]] = []
    for i1 in info1:
        if not info2:
            break
        closest = min(info2, key=lambda i2: _dist(i1["center"], i2["center"]))
        dmin = _dist(i1["center"], closest["center"])
        tolerant = closest["top_family"] in ("LumpedHydrophobe", "Aromatic")
        if dmin < threshold_set2 and (tolerant or dmin < threshold_merge):
            p1, p2 = i1["probs"], closest["probs"]
            probs = {f: max(p1.get(f, 0.0), p2.get(f, 0.0)) for f in set(p1) & set(p2)}
            for f in set(p1) - set(p2):
                probs[f] = p1[f]
            top = max(
                (i1["top_family"], closest["top_family"]),
                key=lambda f: p1.get(f, 0.0) + p2.get(f, 0.0),
            )
            merged.append(
                {
                    "center": (np.asarray(i1["center"]) + np.asarray(closest["center"]))
                    / 2.0,
                    "probs": probs,
                    "top_family": top,
                }
            )

    def _already_merged(info):
        return any(
            _dist(info["center"], m["center"]) < threshold_merge for m in merged
        )

    extras = [i2 for i2 in info2 if not _already_merged(i2)]
    merged.extend(extras)
    merged.extend(i1 for i1 in info1 if not _already_merged(i1))
    return merged


def dual_target_consensus_indiv(
    coords1: np.ndarray,
    families1: Sequence[str],
    coords2: np.ndarray,
    families2: Sequence[str],
    overlap_threshold: float = 1.5,
    n_clusters: int = 7,
    seed: int = 42,
    threshold_set2: float = 4.0,
    threshold_merge: float = 1.0,
) -> List[Tuple[str, np.ndarray]]:
    """Per-molecule dual-target mode (point_dultarget_indiv.py): register
    cloud 1 onto cloud 2 (centroid pre-shift + corresponding-point rigid
    alignment, L137-149), extract the mutual overlap (L193-227), GMM-cluster
    each overlap set *separately* (L355-359), merge clusters across the two
    sets (L361-430), and emit the merged consensus in frame 2 (L486-519)."""
    moved1, r, t = register_clouds(coords1, coords2)
    d1 = nn_distances(moved1, coords2)
    d2 = nn_distances(coords2, moved1)
    keep1 = d1 < overlap_threshold
    keep2 = d2 < overlap_threshold
    ov1 = moved1[keep1]
    ov2 = np.asarray(coords2)[keep2]
    fams1 = [f for f, k in zip(families1, keep1) if k]
    fams2 = [f for f, k in zip(families2, keep2) if k]
    if len(ov1) < n_clusters or len(ov2) < n_clusters:
        raise ValueError(
            f"overlap too small for {n_clusters} clusters per set "
            f"({len(ov1)} / {len(ov2)} points)"
        )
    info1 = cluster_info_gmm(ov1, fams1, n_clusters, seed)
    info2 = cluster_info_gmm(ov2, fams2, n_clusters, seed)
    merged = merge_clusters(info1, info2, threshold_set2, threshold_merge)
    out = []
    for m in merged:
        top = max(m["probs"], key=m["probs"].get)
        out.append((FAMILY2POSP.get(top, "UNKNOWN"), np.asarray(m["center"])))
    return out


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
