"""Symmetry-aware RMSD between molecule conformers.

Behavioral equivalent of the reference's isomorphism-matched RMSD
(DiffPhar/utils.py:148-195): enumerate graph isomorphisms between the two
molecular graphs (element-labeled) and take the minimum heavy-atom RMSD over
atom matchings — symmetric molecules (e.g. para-substituted rings) would
otherwise report spuriously large RMSDs.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cmdgen_tpu.chem.mol import Mol


def _to_nx(mol: Mol):
    import networkx as nx

    g = nx.Graph()
    for i, a in enumerate(mol.atoms):
        g.add_node(i, symbol=a.symbol)
    for b in mol.bonds:
        g.add_edge(b.a1, b.a2, order=b.order)
    return g


def isomorphic_rmsd(
    mol1: Mol,
    coords1: np.ndarray,
    mol2: Mol,
    coords2: np.ndarray,
    max_matches: int = 1000,
    align: bool = False,
) -> Optional[float]:
    """Minimum RMSD over graph isomorphisms; None if graphs don't match.

    align=True additionally Kabsch-aligns per matching (the reference
    compares already-posed conformers, so default is direct RMSD)."""
    import networkx as nx
    from networkx.algorithms import isomorphism

    g1, g2 = _to_nx(mol1), _to_nx(mol2)
    nm = isomorphism.categorical_node_match("symbol", None)
    em = isomorphism.categorical_edge_match("order", None)
    gm = isomorphism.GraphMatcher(g1, g2, node_match=nm, edge_match=em)
    best = None
    for k, mapping in enumerate(gm.isomorphisms_iter()):
        if k >= max_matches:
            break
        idx1 = np.fromiter(mapping.keys(), dtype=np.int64)
        idx2 = np.fromiter(mapping.values(), dtype=np.int64)
        p = coords1[idx1]
        q = coords2[idx2]
        if align:
            import jax.numpy as jnp

            from cmdgen_tpu.ops.kabsch import aligned_rmsd

            r = float(aligned_rmsd(jnp.asarray(p), jnp.asarray(q)))
        else:
            r = float(np.sqrt(((p - q) ** 2).sum(-1).mean()))
        if best is None or r < best:
            best = r
    return best
