"""Learned monotone noise schedule (VDM GammaNetwork).

Behavioral equivalent of GammaNetwork + PositiveLinear
(DiffPhar/equivariant_diffusion/en_diffusion.py:1025-1096): a 1→1024→1
network with softplus-positive weights (hence monotone in t), endpoint-
normalized to learnable [gamma_0, gamma_1] (init −5, 10). Used with the
'learned' noise schedule + vlb loss (en_diffusion.py:28-41).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PositiveLinear(nn.Module):
    features: int
    weight_init_offset: float = -2.0

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (x.shape[-1], self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        return x @ jax.nn.softplus(kernel + self.weight_init_offset) + bias


class GammaNetwork(nn.Module):
    """gamma(t) for t in [0, 1]; input/output shape [..., 1]."""

    hidden: int = 1024

    @nn.compact
    def __call__(self, t):
        l1 = PositiveLinear(1, name="l1")
        l2 = PositiveLinear(self.hidden, name="l2")
        l3 = PositiveLinear(1, name="l3")
        gamma_0 = self.param(
            "gamma_0", lambda k: jnp.asarray([-5.0], dtype=jnp.float32)
        )
        gamma_1 = self.param(
            "gamma_1", lambda k: jnp.asarray([10.0], dtype=jnp.float32)
        )

        def gamma_tilde(u):
            l1_u = l1(u)
            return l1_u + l3(jax.nn.sigmoid(l2(l1_u)))

        zeros = jnp.zeros_like(t)
        ones = jnp.ones_like(t)
        g0, g1, gt = gamma_tilde(zeros), gamma_tilde(ones), gamma_tilde(t)
        normalized = (gt - g0) / (g1 - g0)
        return gamma_0 + (gamma_1 - gamma_0) * normalized
