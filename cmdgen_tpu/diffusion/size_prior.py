"""Joint prior over (pharmacophore, pocket) node counts.

Behavioral equivalent of DistributionNodes
(DiffPhar/equivariant_diffusion/en_diffusion.py:952-1022): a smoothed 2-D
histogram over (N_phar, N_pocket) supporting joint sampling, conditional
sampling given the pocket size, and log-probabilities. Rebuilt on
jax.random.categorical so conditional sampling vectorizes over the batch
instead of the reference's per-element Python loop
(en_diffusion.py:987-994).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SizePrior:
    def __init__(self, histogram: np.ndarray):
        histogram = np.asarray(histogram, dtype=np.float64) + 1e-3
        prob = histogram / histogram.sum()
        self.prob = jnp.asarray(prob, dtype=jnp.float32)
        self.log_prob_joint = jnp.asarray(np.log(prob), dtype=jnp.float32)
        # p(n1 | n2): normalize each column
        cond_n1 = prob / prob.sum(axis=0, keepdims=True)
        self.log_prob_n1_g_n2 = jnp.asarray(np.log(cond_n1), dtype=jnp.float32)
        cond_n2 = prob / prob.sum(axis=1, keepdims=True)
        self.log_prob_n2_g_n1 = jnp.asarray(np.log(cond_n2), dtype=jnp.float32)
        self.n1_max = histogram.shape[0] - 1
        self.n2_max = histogram.shape[1] - 1

    def sample(self, rng, n_samples: int):
        """Joint sample of (n1, n2), shape [n_samples] each."""
        flat = jax.random.categorical(
            rng, jnp.log(self.prob).reshape(-1), shape=(n_samples,)
        )
        n2 = self.prob.shape[1]
        return flat // n2, flat % n2

    def sample_conditional_n1(self, rng, n2: jnp.ndarray):
        """Sample n1 ~ p(n1 | n2) for a batch of pocket sizes n2."""
        n2 = jnp.clip(n2.astype(jnp.int32), 0, self.n2_max)
        logits = self.log_prob_n1_g_n2.T[n2]  # [B, n1_bins]
        keys = jax.random.split(rng, n2.shape[0])
        return jax.vmap(jax.random.categorical)(keys, logits)

    def log_prob(self, n1: jnp.ndarray, n2: jnp.ndarray):
        n1 = jnp.clip(n1.astype(jnp.int32), 0, self.n1_max)
        n2 = jnp.clip(n2.astype(jnp.int32), 0, self.n2_max)
        return self.log_prob_joint[n1, n2]

    def log_prob_n1_given_n2(self, n1: jnp.ndarray, n2: jnp.ndarray):
        n1 = jnp.clip(n1.astype(jnp.int32), 0, self.n1_max)
        n2 = jnp.clip(n2.astype(jnp.int32), 0, self.n2_max)
        return self.log_prob_n1_g_n2[n1, n2]


def smoothed_size_histogram(
    n1s: np.ndarray, n2s: np.ndarray, sigma: float = 1.0
) -> np.ndarray:
    """Build the smoothed joint histogram the preprocessing pipeline stores
    as ``size_distribution.npy`` (process_crossdock.py:156-182)."""
    from scipy.ndimage import gaussian_filter

    n1s = np.asarray(n1s, dtype=np.int64)
    n2s = np.asarray(n2s, dtype=np.int64)
    hist = np.zeros((n1s.max() + 1, n2s.max() + 1), dtype=np.float64)
    np.add.at(hist, (n1s, n2s), 1.0)
    return gaussian_filter(hist, sigma=sigma)
