"""Synthetic-but-realistic geometry generators for benchmarks and tests."""
from __future__ import annotations

import numpy as np


def realistic_ca_pocket(rng: np.random.RandomState, n: int,
                        r_lo: float = 8.0, r_hi: float = 14.0,
                        min_sep: float = 3.8) -> np.ndarray:
    """n CA positions in a shell around the binding site, Poisson-disk-ish.

    Matches folded-protein density (one CA per ~85 Å³, CA-CA >= 3.8 Å) so a
    6 Å-cutoff adjacency sees the same ~5% edge density as a real
    CrossDocked pocket; a Gaussian blob is ~7x too dense and defeats
    cutoff-based sparsity. Returns [n, 3] float32.
    """
    pts: list = []
    while len(pts) < n:
        v = rng.randn(3)
        v /= np.linalg.norm(v) + 1e-9
        r = (r_lo**3 + rng.rand() * (r_hi**3 - r_lo**3)) ** (1 / 3)
        p = v * r
        if pts and np.min(np.linalg.norm(np.array(pts) - p, axis=1)) < min_sep:
            continue
        pts.append(p)
    return np.array(pts, dtype=np.float32)
