"""Masked reductions over padded point clouds.

These replace every torch_scatter use in the reference
(scatter_add / scatter_mean over ragged batch indices, e.g.
DiffPhar/equivariant_diffusion/en_diffusion.py:913-947) with dense masked
reductions over fixed-shape ``[B, N, ...]`` tensors. All of them ignore
padded nodes exactly; padding can hold arbitrary values.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def masked_sum(v: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum of v over the node axis, ignoring padding. mask: [..., N]."""
    return jnp.sum(v * mask[..., None], axis=axis)


def masked_mean(v: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Mean of v over valid nodes. Safe when a row has zero valid nodes."""
    total = jnp.sum(v * mask[..., None], axis=axis)
    count = jnp.sum(mask, axis=-1)[..., None]
    return total / jnp.maximum(count, 1.0)


def sum_except_batch(v: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N, F] -> [B]: sum over nodes and features of valid entries.

    Equivalent of the reference's ``sum_except_batch`` (en_diffusion.py:940-942).
    """
    return jnp.sum(jnp.sum(v, axis=-1) * mask, axis=-1)


def remove_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Project coordinates onto the CoM-free subspace per example.

    Equivalent of ``remove_mean_batch`` (en_diffusion.py:913-917): subtracts
    the masked mean from valid nodes. Padded entries are zeroed so downstream
    masked reductions remain exact.
    """
    mean = masked_mean(x, mask)
    return (x - mean[..., None, :]) * mask[..., None]


def remove_mean_conditional(
    x_a: jnp.ndarray, x_b: jnp.ndarray, mask_a: jnp.ndarray, mask_b: jnp.ndarray
):
    """Subtract the CoM of cloud *a* from both clouds (per example).

    Equivalent of the conditional model's remove_mean_batch
    (conditional_model.py:467-475): only the generated (pharmacophore) part
    defines the origin; the fixed context (pocket) is translated along.
    """
    mean = masked_mean(x_a, mask_a)
    x_a = (x_a - mean[..., None, :]) * mask_a[..., None]
    x_b = (x_b - mean[..., None, :]) * mask_b[..., None]
    return x_a, x_b


def mean_zero_max_rel_error(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Relative CoM drift, the quantity the reference asserts on
    (en_diffusion.py:919-924). Returned as a value (jit-friendly) rather than
    raised, so callers/tests can check ``< 1e-2``."""
    largest = jnp.max(jnp.abs(x * mask[..., None]))
    err = jnp.max(jnp.abs(masked_sum(x, mask)))
    return err / (largest + _EPS)


def pair_mask(mask_row: jnp.ndarray, mask_col: jnp.ndarray) -> jnp.ndarray:
    """[B,N],[B,M] -> [B,N,M] outer product of validity masks."""
    return mask_row[..., :, None] * mask_col[..., None, :]
