"""Diffusion noise schedules and the alpha/sigma/SNR algebra.

Behavioral equivalents of the reference's PredefinedNoiseSchedule and the
gamma-parameterized algebra (DiffPhar/equivariant_diffusion/en_diffusion.py:
1099-1188 for the schedules, 79-103 and 859-872 for the algebra), built as
pure functions over a precomputed gamma lookup table so the whole reverse
chain stays inside one jitted scan.

Conventions (identical to VDM / the reference):
  alpha(g) = sqrt(sigmoid(-g)),  sigma(g) = sqrt(sigmoid(g)),
  SNR(g)   = exp(-g),            alpha^2 + sigma^2 = 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step alpha ratio for sampling stability (en_diffusion.py:1119-1132)."""
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_alphas2(timesteps: int, s: float = 1e-4, power: float = 3.0) -> np.ndarray:
    """alpha_t^2 for the ``polynomial_p`` schedule (en_diffusion.py:1135-1149)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = _clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    return precision * alphas2 + s


def cosine_alphas2(timesteps: int, s: float = 0.008) -> np.ndarray:
    """alpha_t^2 for the cosine schedule (en_diffusion.py:1099-1116)."""
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    return np.cumprod(1.0 - betas, axis=0)


def gamma_table(noise_schedule: str, timesteps: int, precision: float = 1e-4) -> jnp.ndarray:
    """Precompute gamma = -log(alpha^2/sigma^2) lookup of length timesteps+1.

    ``noise_schedule`` is either 'cosine' or 'polynomial_<power>' — same
    naming as the reference configs (configs/crossdocked_full_cond.yml:44).
    """
    if noise_schedule == "cosine":
        alphas2 = cosine_alphas2(timesteps)
    elif noise_schedule.startswith("polynomial"):
        splits = noise_schedule.split("_")
        assert len(splits) == 2, noise_schedule
        alphas2 = polynomial_alphas2(timesteps, s=precision, power=float(splits[1]))
    else:
        raise ValueError(f"unknown noise schedule {noise_schedule!r}")
    sigmas2 = 1.0 - alphas2
    gamma = -(np.log(alphas2) - np.log(sigmas2))
    return jnp.asarray(gamma, dtype=jnp.float32)


def gamma_at(gamma_tab: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Look up gamma(t) for normalized t in [0, 1] (en_diffusion.py:1186-1188)."""
    timesteps = gamma_tab.shape[0] - 1
    t_int = jnp.round(t * timesteps).astype(jnp.int32)
    return gamma_tab[t_int]


def alpha(gamma: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jax.nn.sigmoid(-gamma))


def sigma(gamma: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jax.nn.sigmoid(gamma))


def snr(gamma: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(-gamma)


def sigma_and_alpha_t_given_s(gamma_t: jnp.ndarray, gamma_s: jnp.ndarray):
    """Transition coefficients for q(z_t | z_s), t > s.

    Returns (sigma2_{t|s}, sigma_{t|s}, alpha_{t|s}); the identities match
    en_diffusion.py:79-103:
      alpha_{t|s} = alpha_t / alpha_s
      sigma^2_{t|s} = -expm1(softplus(gamma_s) - softplus(gamma_t))
    """
    sigma2_t_given_s = -jnp.expm1(
        jax.nn.softplus(gamma_s) - jax.nn.softplus(gamma_t)
    )
    log_alpha2_t = jax.nn.log_sigmoid(-gamma_t)
    log_alpha2_s = jax.nn.log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s


def cdf_standard_gaussian(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))
