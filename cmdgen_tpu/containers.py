"""Padded point-cloud containers.

The reference keeps ragged per-complex node lists concatenated into flat
tensors with integer batch masks and uses torch_scatter for all reductions
(reference: DiffPhar/dataset.py:47-64, equivariant_diffusion/en_diffusion.py:8).
On TPU we use fixed-shape padded tensors ``[B, N_max, ...]`` with boolean
validity masks instead; every reduction becomes a masked dense reduction that
XLA can fuse, and batch size / node count are static under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """A batch of padded 3-D point clouds with categorical node features.

    Attributes:
      x:    [B, N, 3]  coordinates (padded entries are arbitrary; use mask).
      h:    [B, N, F]  node features (one-hot types for real data).
      mask: [B, N]     1.0 for valid nodes, 0.0 for padding (float32).
    """

    x: jnp.ndarray
    h: jnp.ndarray
    mask: jnp.ndarray

    @property
    def size(self) -> jnp.ndarray:
        """[B] number of valid nodes per example."""
        return jnp.sum(self.mask, axis=-1)

    @property
    def n_max(self) -> int:
        return self.x.shape[-2]

    @property
    def batch(self) -> int:
        return self.x.shape[0]

    @property
    def n_features(self) -> int:
        return self.h.shape[-1]

    def replace(self, **kwargs) -> "PointCloud":
        return dataclasses.replace(self, **kwargs)

    def with_xh(self, xh: jnp.ndarray) -> "PointCloud":
        """Split a concatenated [B, N, 3+F] state back into x and h."""
        return self.replace(x=xh[..., :3], h=xh[..., 3:])

    @property
    def xh(self) -> jnp.ndarray:
        """[B, N, 3+F] concatenated coordinate+feature state."""
        return jnp.concatenate([self.x, self.h], axis=-1)


def pad_point_cloud(
    xs: list, hs: list, n_max: Optional[int] = None, dtype=np.float32
) -> PointCloud:
    """Pack a list of (n_i, 3) coords and (n_i, F) features into a PointCloud.

    Host-side helper used at the featurization boundary: ragged per-complex
    arrays in, fixed-shape padded device arrays out.
    """
    assert len(xs) == len(hs) and len(xs) > 0
    sizes = [int(np.asarray(x).shape[0]) for x in xs]
    if n_max is None:
        n_max = max(sizes)
    if max(sizes) > n_max:
        raise ValueError(f"n_max={n_max} smaller than largest cloud {max(sizes)}")
    b = len(xs)
    f = int(np.asarray(hs[0]).shape[-1])
    x = np.zeros((b, n_max, 3), dtype=dtype)
    h = np.zeros((b, n_max, f), dtype=dtype)
    mask = np.zeros((b, n_max), dtype=dtype)
    for i, (xi, hi, n) in enumerate(zip(xs, hs, sizes)):
        x[i, :n] = np.asarray(xi, dtype=dtype)
        h[i, :n] = np.asarray(hi, dtype=dtype)
        mask[i, :n] = 1.0
    return PointCloud(x=jnp.asarray(x), h=jnp.asarray(h), mask=jnp.asarray(mask))


def mask_from_sizes(sizes: jnp.ndarray, n_max: int) -> jnp.ndarray:
    """[B] node counts -> [B, n_max] float validity mask.

    TPU-friendly replacement for the reference's repeat_interleave batch-mask
    construction (DiffPhar/utils.py:137-145).
    """
    idx = jnp.arange(n_max)[None, :]
    return (idx < sizes[:, None]).astype(jnp.float32)
