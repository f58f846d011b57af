"""Distance-geometry conformer embedding on TPU.

Replaces RDKit's EmbedLib.EmbedPharmacophore machinery used by PharAlign
(PharAlign/align_test_wrn.py:118-219): build a distance-bounds matrix from
the molecular graph (bond lengths, 1-3 angles, triangle smoothing), sample
random distance matrices, embed them to 3-D by classical MDS, and refine
coordinates by gradient descent on bound violations — all batched over
conformers with vmap, so hundreds of conformers embed in one jit call.
Optional pharmacophore constraints pull feature-centroid pairs toward the
target pairwise distances (the rotation-invariant form of RDKit's
pharmacophore embedding constraints).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem.mol import Mol

# covalent radii (Å) for bond-length estimates
COVALENT_RADII = {
    "H": 0.31, "B": 0.84, "C": 0.76, "N": 0.71, "O": 0.66, "F": 0.57,
    "P": 1.07, "S": 1.05, "Cl": 1.02, "Br": 1.20, "I": 1.39, "Se": 1.20,
}
VDW_RADII = {
    "H": 1.2, "C": 1.7, "N": 1.55, "O": 1.52, "F": 1.47, "P": 1.8,
    "S": 1.8, "Cl": 1.75, "Br": 1.85, "I": 1.98, "B": 1.92, "Se": 1.9,
}


def bond_length(mol: Mol, bi: int) -> float:
    b = mol.bonds[bi]
    r = COVALENT_RADII.get(mol.atoms[b.a1].symbol, 0.77) + COVALENT_RADII.get(
        mol.atoms[b.a2].symbol, 0.77
    )
    if b.aromatic:
        return r * 0.92
    if b.order == 2:
        return r * 0.87
    if b.order == 3:
        return r * 0.81
    return r


def _ideal_angle(mol: Mol, center: int) -> float:
    """Idealized bond angle at an atom (rad)."""
    a = mol.atoms[center]
    orders = [mol.bonds[bi].order for _, bi in mol.neighbors(center)]
    if a.aromatic or 2 in orders:
        return np.deg2rad(120.0)
    if 3 in orders:
        return np.deg2rad(180.0)
    return np.deg2rad(109.5)


def bounds_matrix(mol: Mol) -> Tuple[np.ndarray, np.ndarray]:
    """(lower, upper) distance bounds over heavy atoms."""
    n = mol.n_atoms
    big = 1000.0
    lower = np.zeros((n, n))
    upper = np.full((n, n), big)
    np.fill_diagonal(upper, 0.0)
    for i in range(n):
        vi = VDW_RADII.get(mol.atoms[i].symbol, 1.7)
        for j in range(n):
            if i != j:
                vj = VDW_RADII.get(mol.atoms[j].symbol, 1.7)
                lower[i, j] = 0.8 * (vi + vj)
    # 1-2
    for bi, b in enumerate(mol.bonds):
        d = bond_length(mol, bi)
        lower[b.a1, b.a2] = lower[b.a2, b.a1] = d - 0.01
        upper[b.a1, b.a2] = upper[b.a2, b.a1] = d + 0.01
    # 1-3 via law of cosines at the common atom
    for c in range(n):
        nbrs = [(nb, bi) for nb, bi in mol.neighbors(c)]
        theta = _ideal_angle(mol, c)
        for x in range(len(nbrs)):
            for y in range(x + 1, len(nbrs)):
                i, bi1 = nbrs[x]
                j, bi2 = nbrs[y]
                d1, d2 = bond_length(mol, bi1), bond_length(mol, bi2)
                d13 = np.sqrt(
                    d1 * d1 + d2 * d2 - 2 * d1 * d2 * np.cos(theta)
                )
                lower[i, j] = lower[j, i] = max(lower[i, j], d13 - 0.05)
                upper[i, j] = upper[j, i] = min(upper[i, j], d13 + 0.05)
    # triangle smoothing of upper bounds (Floyd-Warshall)
    for k in range(n):
        upper = np.minimum(upper, upper[:, k : k + 1] + upper[k : k + 1, :])
    lower = np.minimum(lower, upper)  # keep bounds consistent
    return lower, upper


def _classical_mds(d2: jnp.ndarray) -> jnp.ndarray:
    """Metric-matrix embedding of a squared-distance matrix to 3-D."""
    n = d2.shape[0]
    j = jnp.eye(n) - jnp.ones((n, n)) / n
    b = -0.5 * j @ d2 @ j
    vals, vecs = jnp.linalg.eigh(b)
    top = vals[-3:]
    v = vecs[:, -3:]
    return v * jnp.sqrt(jnp.maximum(top, 1e-6))[None, :]


def _mds_top3(d2: jnp.ndarray, key: jax.Array, iters: int = 15) -> jnp.ndarray:
    """3-D MDS embedding via subspace iteration on the metric matrix.

    Same init as ``_classical_mds`` but computes only the top-3 eigenpairs
    with Gershgorin-shifted subspace iteration (iters × [n,n]@[n,3] matmuls
    + a thin QR). A full batched ``eigh`` is the dominant cost of the padded
    embedding path on TPU; the refinement that follows forgives the
    approximation (the MDS output is only an initializer).
    """
    n = d2.shape[0]
    j = jnp.eye(n) - jnp.ones((n, n)) / n
    b = -0.5 * j @ d2 @ j
    # shift so all eigenvalues are >= 0: subspace iteration then converges
    # to the algebraically largest three of b
    s = jnp.max(jnp.sum(jnp.abs(b), axis=-1))
    bs = b + s * jnp.eye(n)
    v = jax.random.normal(key, (n, 3))

    def _orth3(w):
        # 3-column modified Gram-Schmidt: plain vector ops (TPU's QR is a
        # slow unbatched custom call and dominated the embedding wall time)
        q0 = w[:, 0] / (jnp.linalg.norm(w[:, 0]) + 1e-12)
        w1 = w[:, 1] - q0 * jnp.dot(q0, w[:, 1])
        q1 = w1 / (jnp.linalg.norm(w1) + 1e-12)
        w2 = w[:, 2] - q0 * jnp.dot(q0, w[:, 2]) - q1 * jnp.dot(q1, w[:, 2])
        q2 = w2 / (jnp.linalg.norm(w2) + 1e-12)
        return jnp.stack([q0, q1, q2], axis=1)

    for _ in range(iters):
        v = _orth3(bs @ v)
    lam = jnp.sum(v * (b @ v), axis=0)  # Rayleigh quotients under b
    return v * jnp.sqrt(jnp.maximum(lam, 1e-6))[None, :]


def embed_conformers(
    mol: Mol,
    n_conformers: int,
    rng: jax.Array,
    refine_steps: int = 200,
    lr: float = 0.05,
    momentum: float = 0.75,
    centroid_groups: Optional[Sequence[Sequence[int]]] = None,
    centroid_targets: Optional[np.ndarray] = None,
    centroid_weight: float = 1.0,
) -> jnp.ndarray:
    """Sample + embed + refine n_conformers. Returns [C, N, 3].

    centroid_groups/targets: optional pharmacophore constraints — pairwise
    distances between the centroids of the given atom groups are pulled
    toward targets [G, G].
    """
    lower, upper = bounds_matrix(mol)
    lo = jnp.asarray(lower, dtype=jnp.float32)
    up = jnp.asarray(jnp.minimum(upper, 100.0), dtype=jnp.float32)
    n = mol.n_atoms

    groups = None
    targets = None
    if centroid_groups is not None and len(centroid_groups) >= 2:
        g = len(centroid_groups)
        gm = np.zeros((g, n), dtype=np.float32)
        for k, atoms in enumerate(centroid_groups):
            for a in atoms:
                gm[k, a] = 1.0 / len(atoms)
        groups = jnp.asarray(gm)
        targets = jnp.asarray(centroid_targets, dtype=jnp.float32)
    return _embed_from_bounds(
        lo, up, groups, targets, n_conformers, rng,
        refine_steps, lr, momentum, centroid_weight,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_conformers", "refine_steps", "lr", "momentum", "centroid_weight"
    ),
)
def _embed_from_bounds(lo, up, groups, targets, n_conformers, rng,
                       refine_steps, lr, momentum, centroid_weight):
    """Device half of ``embed_conformers`` (jitted — eagerly, the vmapped
    MDS dispatches hundreds of small ops and launch latency dominates)."""
    n = lo.shape[0]

    def one(key):
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (n, n))
        d = lo + u * (up - lo)
        d = (d + d.T) / 2.0
        d = d.at[jnp.diag_indices(n)].set(0.0)
        x0 = _mds_top3(d * d, k3)
        x0 = x0 + 0.05 * jax.random.normal(k2, x0.shape)

        def loss(x):
            diff = x[:, None, :] - x[None, :, :]
            dist = jnp.sqrt(jnp.sum(diff**2, -1) + 1e-8)
            over = jnp.maximum(dist - up, 0.0)
            under = jnp.maximum(lo - dist, 0.0)
            mask_off = 1.0 - jnp.eye(n)
            l = jnp.sum((over**2 + under**2) * mask_off)
            if groups is not None:
                cents = groups @ x  # [G, 3]
                cd = jnp.sqrt(
                    jnp.sum(
                        (cents[:, None, :] - cents[None, :, :]) ** 2, -1
                    )
                    + 1e-8
                )
                l = l + centroid_weight * jnp.sum(
                    (cd - targets) ** 2 * (1.0 - jnp.eye(targets.shape[0]))
                )
            return l

        # heavy-ball gradient descent: ~2x fewer steps than plain GD for
        # the same bound-violation level on these quadratic-penalty losses
        def step(carry, _):
            x, v = carry
            v = momentum * v - lr * jax.grad(loss)(x)
            return (x + v, v), None

        (x, _), _ = jax.lax.scan(
            step, (x0, jnp.zeros_like(x0)), None, length=refine_steps
        )
        return x

    keys = jax.random.split(rng, n_conformers)
    return jax.vmap(one)(keys)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_conformers", "refine_steps", "lr", "momentum", "centroid_weight"
    ),
)
def embed_conformers_padded(
    lo: jnp.ndarray,       # [M, Nb, Nb] lower bounds (0 on padded pairs)
    up: jnp.ndarray,       # [M, Nb, Nb] upper bounds
    atom_mask: jnp.ndarray,  # [M, Nb]
    n_conformers: int,
    rng: jax.Array,
    refine_steps: int = 200,
    lr: float = 0.05,
    momentum: float = 0.75,
    groups: Optional[jnp.ndarray] = None,    # [M, G, Nb] centroid weights
    targets: Optional[jnp.ndarray] = None,   # [M, G, G] target distances
    group_mask: Optional[jnp.ndarray] = None,  # [M, G]
    centroid_weight: float = 1.0,
) -> jnp.ndarray:
    """Batched embedding: M molecules × n_conformers in ONE jit call
    (jitted here — run eagerly, the vmapped MDS dispatches hundreds of
    small ops per call, which costs seconds of launch latency on TPU).

    Molecules are padded to a common atom count so the whole PharAlign
    stage compiles once per size bucket instead of once per molecule
    (the per-molecule path was the end-to-end throughput bottleneck).
    Returns [M, C, Nb, 3].
    """
    m, nb, _ = lo.shape
    pairm = atom_mask[:, :, None] * atom_mask[:, None, :]
    off_diag = 1.0 - jnp.eye(nb)[None]
    pair_valid = pairm * off_diag

    def one(lo_i, up_i, pv_i, g_i, t_i, gm_i, key):
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (nb, nb))
        d = lo_i + u * (up_i - lo_i)
        d = (d + d.T) / 2.0
        d = d * pv_i  # padded pairs at distance 0
        x0 = _mds_top3(d * d, k3)
        x0 = x0 + 0.05 * jax.random.normal(k2, x0.shape)

        def loss(x):
            diff = x[:, None, :] - x[None, :, :]
            dist = jnp.sqrt(jnp.sum(diff**2, -1) + 1e-8)
            over = jnp.maximum(dist - up_i, 0.0)
            under = jnp.maximum(lo_i - dist, 0.0)
            l = jnp.sum((over**2 + under**2) * pv_i)
            if g_i is not None:
                cents = g_i @ x
                cd = jnp.sqrt(
                    jnp.sum((cents[:, None, :] - cents[None, :, :]) ** 2, -1)
                    + 1e-8
                )
                gm2 = gm_i[:, None] * gm_i[None, :]
                l = l + centroid_weight * jnp.sum(
                    (cd - t_i) ** 2 * gm2 * (1.0 - jnp.eye(t_i.shape[0]))
                )
            return l

        def step(carry, _):
            x, v = carry
            v = momentum * v - lr * jax.grad(loss)(x)
            return (x + v, v), None

        (x, _), _ = jax.lax.scan(
            step, (x0, jnp.zeros_like(x0)), None, length=refine_steps
        )
        return x

    keys = jax.random.split(rng, m * n_conformers).reshape(m, n_conformers, 2)

    if groups is None:
        def per_mol(lo_i, up_i, pv_i, keys_i):
            return jax.vmap(
                lambda k: one(lo_i, up_i, pv_i, None, None, None, k)
            )(keys_i)

        return jax.vmap(per_mol)(lo, up, pair_valid, keys)

    def per_mol(lo_i, up_i, pv_i, g_i, t_i, gm_i, keys_i):
        return jax.vmap(
            lambda k: one(lo_i, up_i, pv_i, g_i, t_i, gm_i, k)
        )(keys_i)

    return jax.vmap(per_mol)(
        lo, up, pair_valid, groups, targets, group_mask, keys
    )


def padded_bounds(mols: List[Mol], n_pad: Optional[int] = None):
    """Stack per-molecule bounds into padded arrays for
    embed_conformers_padded. Returns (lo, up, atom_mask) numpy arrays."""
    sizes = [m.n_atoms for m in mols]
    if n_pad is None:
        n_pad = max(sizes)
    m = len(mols)
    lo = np.zeros((m, n_pad, n_pad), dtype=np.float32)
    up = np.zeros((m, n_pad, n_pad), dtype=np.float32)
    mask = np.zeros((m, n_pad), dtype=np.float32)
    for i, mol in enumerate(mols):
        n = mol.n_atoms
        l, u = bounds_matrix(mol)
        lo[i, :n, :n] = l
        up[i, :n, :n] = np.minimum(u, 100.0)
        mask[i, :n] = 1.0
    return lo, up, mask


def bounds_violation(mol: Mol, coords: np.ndarray) -> float:
    """Mean absolute bound violation of a conformer (quality check)."""
    lower, upper = bounds_matrix(mol)
    d = np.sqrt(
        ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1) + 1e-12
    )
    over = np.maximum(d - np.minimum(upper, 100.0), 0)
    under = np.maximum(lower - d, 0)
    n = len(coords)
    off = ~np.eye(n, dtype=bool)
    return float((over + under)[off].mean())
