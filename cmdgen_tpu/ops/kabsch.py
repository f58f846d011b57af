"""Batched Kabsch rigid alignment and RMSD on TPU.

Behavioral equivalent of rigid_transform_Kabsch_3D
(DiffPhar/get_phar/point_dultarget.py:51-82, with the reflection fix) and of
PharAlign's per-conformer RMSD alignment loops, re-designed as vmap-able
pure functions so thousands of alignments run as one batched SVD on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch(p: jnp.ndarray, q: jnp.ndarray, weights=None):
    """Optimal rotation R and translation t with R @ p_i + t ≈ q_i.

    p, q: [N, 3] paired points. Returns (R [3,3], t [3]).
    """
    if weights is None:
        weights = jnp.ones(p.shape[0])
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    cp = jnp.sum(p * w[:, None], axis=0)
    cq = jnp.sum(q * w[:, None], axis=0)
    p0 = p - cp
    q0 = q - cq
    h = (p0 * w[:, None]).T @ q0
    u, s, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    # build the corrected rotation without data-dependent branching
    r = vt.T @ diag @ u.T
    t = cq - r @ cp
    return r, t


def apply_rigid(r: jnp.ndarray, t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return p @ r.T + t


def rmsd(p: jnp.ndarray, q: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Root-mean-square deviation between paired points."""
    d2 = jnp.sum((p - q) ** 2, axis=-1)
    if mask is not None:
        return jnp.sqrt(jnp.sum(d2 * mask, axis=-1) / jnp.maximum(jnp.sum(mask, -1), 1))
    return jnp.sqrt(jnp.mean(d2, axis=-1))


def aligned_rmsd(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """RMSD after optimal rigid alignment of p onto q."""
    r, t = kabsch(p, q)
    return rmsd(apply_rigid(r, t, p), q)


# batched variants: leading axis is the batch
kabsch_batch = jax.vmap(kabsch)
aligned_rmsd_batch = jax.vmap(aligned_rmsd)
