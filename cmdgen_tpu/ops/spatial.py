"""Spatial ordering of point clouds (Morton/Z-order).

Sorting pocket atoms by spatial locality concentrates the 6 Å-cutoff edges
near the diagonal of the pair matrix, which is what makes the block-sparse
EGNN kernel (ops/egnn_pallas.py) actually skip work — with arbitrary PDB
atom order, edges scatter uniformly and every block is occupied (PERF.md).
Node order is otherwise semantically irrelevant (the EGNN is permutation
equivariant), so this is a free preprocessing step.
"""
from __future__ import annotations

import numpy as np


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave 10 bits with two zero bits each (for 3-D Morton codes)."""
    v = v.astype(np.uint64) & np.uint64(0x3FF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
    return v


def morton_codes(coords: np.ndarray, resolution: float = 1.0) -> np.ndarray:
    """[N,3] coords -> uint64 Z-order codes at the given grid resolution."""
    c = np.asarray(coords, dtype=np.float64)
    q = np.floor((c - c.min(axis=0)) / resolution).astype(np.uint64)
    q = np.clip(q, 0, 1023)
    return (
        _spread_bits(q[:, 0])
        | (_spread_bits(q[:, 1]) << np.uint64(1))
        | (_spread_bits(q[:, 2]) << np.uint64(2))
    )


def morton_order(coords: np.ndarray, resolution: float = 2.0) -> np.ndarray:
    """Permutation sorting points along a Z-order curve."""
    return np.argsort(morton_codes(coords, resolution), kind="stable")


def sort_point_cloud(coords: np.ndarray, *features: np.ndarray,
                     resolution: float = 2.0):
    """Reorder coords (and any aligned per-point feature arrays) by Morton
    order. Returns (coords, *features) reordered."""
    perm = morton_order(coords, resolution)
    out = [np.asarray(coords)[perm]]
    for f in features:
        out.append(np.asarray(f)[perm])
    return tuple(out) if features else out[0]


def block_occupancy(coords: np.ndarray, cutoff: float,
                    tile: int = 16) -> float:
    """Fraction of (tile × tile) pair blocks containing at least one edge —
    the quantity the block-sparse kernel's speedup depends on."""
    c = np.asarray(coords)
    n = len(c)
    d2 = ((c[:, None] - c[None]) ** 2).sum(-1)
    adj = d2 <= cutoff * cutoff
    nt = (n + tile - 1) // tile
    occ = 0
    for i in range(nt):
        for j in range(nt):
            blk = adj[i * tile : (i + 1) * tile, j * tile : (j + 1) * tile]
            occ += int(blk.any())
    return occ / (nt * nt)
