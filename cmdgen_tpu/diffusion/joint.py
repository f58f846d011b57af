"""Joint E(3) DDPM over pharmacophore + pocket with RePaint inpainting.

Behavioral equivalent of EnVariationalDiffusion
(DiffPhar/equivariant_diffusion/en_diffusion.py:13-949): both node types are
diffused jointly in the CoM-free subspace of the combined cloud; pocket-
conditioned generation happens by *inpainting* (fix the pocket, resample the
pharmacophore part, RePaint schedule with jumps —
en_diffusion.py:649-831).

TPU-native: the entire RePaint schedule (denoise + renoise jumps) is
precomputed host-side into static op arrays and executed as one lax.scan;
each element switches between a denoise step and a renoise jump with
lax.cond. No host round-trips.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.cddpm import (
    ConditionalDDPM,
    DDPMConfig,
    _gaussian_kl,
    _inflate,
    sample_t_int,
)
from cmdgen_tpu.diffusion.gamma_net import GammaNetwork
from cmdgen_tpu.diffusion.size_prior import SizePrior
from cmdgen_tpu.models.dynamics import EGNNDynamics
from cmdgen_tpu.ops import schedules as sch
from cmdgen_tpu.ops.masked import sum_except_batch


def _remove_mean_joint(x_a, x_b, mask_a, mask_b):
    """Project the combined cloud onto its CoM-free subspace
    (en_diffusion.py:913-917 over the concatenated masks)."""
    total = jnp.sum(x_a * mask_a[..., None], -2) + jnp.sum(
        x_b * mask_b[..., None], -2
    )
    count = jnp.sum(mask_a, -1) + jnp.sum(mask_b, -1)
    mean = total / jnp.maximum(count, 1.0)[..., None]
    return (
        (x_a - mean[..., None, :]) * mask_a[..., None],
        (x_b - mean[..., None, :]) * mask_b[..., None],
    )


def get_repaint_schedule(
    resamplings: int, jump_length: int, timesteps: int
) -> List[int]:
    """Number of denoise steps before each jump (en_diffusion.py:643-670)."""
    schedule = []
    curr_t = 0
    while curr_t < timesteps:
        if curr_t + jump_length < timesteps:
            if len(schedule) > 0:
                schedule[-1] += jump_length
                schedule.extend([jump_length] * (resamplings - 1))
            else:
                schedule.extend([jump_length] * resamplings)
            curr_t += jump_length
        else:
            residual = timesteps - curr_t
            if len(schedule) > 0:
                schedule[-1] += residual
            else:
                schedule.append(residual)
            curr_t += residual
    return list(reversed(schedule))


def repaint_ops(resamplings: int, jump_length: int, timesteps: int):
    """Flatten the RePaint loop into static (kind, s) arrays.

    kind 0 = denoise step t=s+1 -> s; kind 1 = renoise jump s -> s+jump.
    Mirrors the control flow at en_diffusion.py:724-806.
    """
    schedule = get_repaint_schedule(resamplings, jump_length, timesteps)
    kinds, svals = [], []
    s = timesteps - 1
    for i, n_denoise in enumerate(schedule):
        for j in range(n_denoise):
            kinds.append(0)
            svals.append(s)
            if j == n_denoise - 1 and i < len(schedule) - 1:
                kinds.append(1)
                svals.append(s)
                s = s + jump_length
            s -= 1
    return np.asarray(kinds, dtype=np.int32), np.asarray(svals, dtype=np.int32)


class JointDDPM:
    """Unconditional joint diffusion + inpainting sampler."""

    def __init__(self, cfg: DDPMConfig, dynamics: EGNNDynamics,
                 size_prior: Optional[SizePrior] = None,
                 apply_fn=None):
        assert dynamics.cfg.update_pocket_coords, (
            "joint mode diffuses pocket coordinates too"
        )
        self.cfg = cfg
        self.dynamics = dynamics
        self.size_prior = size_prior
        self._apply = apply_fn if apply_fn is not None else dynamics.apply
        if cfg.noise_schedule == "learned":
            # learned monotone gamma(t), trained through the vlb
            # (en_diffusion.py:29-41)
            assert cfg.loss_type == "vlb", (
                "noise_schedule='learned' requires loss_type='vlb'"
            )
            self.gamma_net = GammaNetwork()
            self.gamma = None
        else:
            self.gamma_net = None
            self.gamma = sch.gamma_table(
                cfg.noise_schedule, cfg.timesteps, cfg.noise_precision
            )
        self.phar_nf = dynamics.cfg.phar_nf
        self.residue_nf = dynamics.cfg.residue_nf

    # same learned-schedule plumbing as ConditionalDDPM (cddpm.py)
    init_extra_params = ConditionalDDPM.init_extra_params
    _gamma_t_norm = ConditionalDDPM._gamma_t_norm
    _gamma0 = ConditionalDDPM._gamma0
    _gammaT = ConditionalDDPM._gammaT
    check_norm_values = ConditionalDDPM.check_norm_values

    # ---------------------------------------------------------------- utils

    def normalize(self, pc: PointCloud) -> PointCloud:
        cfg = self.cfg
        return pc.replace(
            x=pc.x / cfg.norm_x, h=(pc.h - cfg.norm_bias_h) / cfg.norm_h
        )

    def unnormalize_x(self, x):
        return x * self.cfg.norm_x

    def _gamma_at_int(self, params, t_int):
        return self._gamma_t_norm(params, t_int / self.cfg.timesteps)

    def subspace_dim(self, n_total):
        return (n_total - 1.0) * self.cfg.n_dims

    def _sample_joint_noise(self, rng, phar_mask, pocket_mask):
        """Mean-centered x noise over the combined cloud + iid h noise
        (en_diffusion.py:556-575, 926-936)."""
        k1, k2, k3 = jax.random.split(rng, 3)
        b, n_p = phar_mask.shape
        n_q = pocket_mask.shape[1]
        nd = self.cfg.n_dims
        x_p = jax.random.normal(k1, (b, n_p, nd)) * phar_mask[..., None]
        x_q = jax.random.normal(k2, (b, n_q, nd)) * pocket_mask[..., None]
        x_p, x_q = _remove_mean_joint(x_p, x_q, phar_mask, pocket_mask)
        h_p = jax.random.normal(k3, (b, n_p, self.phar_nf)) * phar_mask[..., None]
        k4 = jax.random.fold_in(k3, 1)
        h_q = (
            jax.random.normal(k4, (b, n_q, self.residue_nf))
            * pocket_mask[..., None]
        )
        eps_p = jnp.concatenate([x_p, h_p], axis=-1)
        eps_q = jnp.concatenate([x_q, h_q], axis=-1)
        return eps_p, eps_q

    # ----------------------------------------------------------------- loss

    def loss(self, params, rng, phar: PointCloud, pocket: PointCloud,
             training: bool = True):
        """Joint NLL terms (en_diffusion.py:337-465 + the l2/vlb assembly in
        lightning_modules.py:196-231 with both error terms)."""
        cfg = self.cfg
        b = phar.batch
        k_t, k_eps, k_eps0 = jax.random.split(rng, 3)
        lowest_t = 0 if training else 1
        t_int = sample_t_int(
            k_t, b, lowest_t, cfg.timesteps, stratified=cfg.stratified_t
        )
        eps_p, eps_q = self._sample_joint_noise(k_eps, phar.mask, pocket.mask)
        eps0_p, eps0_q = self._sample_joint_noise(
            k_eps0, phar.mask, pocket.mask
        )
        return self.loss_given_noise(
            params, phar, pocket, t_int, eps_p, eps_q, eps0_p, eps0_q,
            training,
        )

    def loss_given_noise(
        self, params, phar: PointCloud, pocket: PointCloud,
        t_int, eps_p, eps_q, eps0_p, eps0_q,
        training: bool = True, return_terms: bool = False,
    ):
        """Deterministic half of :meth:`loss`: the NLL given explicit
        per-sample timesteps ``t_int`` [B] and CoM-projected joint noise
        draws (``eps0_*`` only read on the eval path's second t=0 forward,
        en_diffusion.py:423-443). Split out so the reference-transplant
        parity test can drive identical randomness through both
        implementations."""
        cfg = self.cfg
        nd = cfg.n_dims
        b = phar.batch

        phar = self.normalize(phar)
        pocket = self.normalize(pocket)
        n_total = phar.size + pocket.size
        delta_log_px = -self.subspace_dim(n_total) * math.log(cfg.norm_x)

        t_int = jnp.asarray(t_int, jnp.float32)
        t_is_zero = (t_int == 0).astype(jnp.float32)
        gamma_s = self._gamma_at_int(params, t_int - 1.0)
        gamma_t = self._gamma_at_int(params, t_int)

        xh_phar = phar.xh
        xh_pocket = pocket.xh

        alpha_t, sigma_t = sch.alpha(gamma_t), sch.sigma(gamma_t)
        z_t_p = _inflate(alpha_t) * xh_phar + _inflate(sigma_t) * eps_p
        z_t_q = _inflate(alpha_t) * xh_pocket + _inflate(sigma_t) * eps_q

        t_norm = (t_int / cfg.timesteps)[:, None]
        net_p, net_q = self._apply(
            params, z_t_p, z_t_q, t_norm, phar.mask, pocket.mask
        )

        error_t_phar = sum_except_batch((eps_p - net_p) ** 2, phar.mask)
        error_t_pocket = sum_except_batch((eps_q - net_q) ** 2, pocket.mask)
        snr_weight = 1.0 - sch.snr(gamma_s - gamma_t)

        gamma_0_scalar = self._gamma0(params)
        d_x = self.subspace_dim(n_total)
        neg_log_constants = -d_x * (
            -0.5 * gamma_0_scalar - 0.5 * math.log(2 * math.pi)
        )

        kl_prior = self._kl_prior_with_pocket(
            params,
            xh_phar, xh_pocket, phar.mask, pocket.mask, n_total
        )

        if training:
            loss0_x_p, loss0_x_q, loss0_h = self._neg_log_pxh_given_z0(
                phar, pocket, z_t_p, z_t_q, eps_p, eps_q, net_p, net_q,
                gamma_t
            )
            loss0_x_p = loss0_x_p * t_is_zero
            loss0_x_q = loss0_x_q * t_is_zero
            loss0_h = loss0_h * t_is_zero
            error_t_phar = error_t_phar * (1.0 - t_is_zero)
            error_t_pocket = error_t_pocket * (1.0 - t_is_zero)
        else:
            # second forward pass at t=0 for a lower-variance L0 estimate
            # (en_diffusion.py:423-443)
            gamma_0 = jnp.broadcast_to(gamma_0_scalar, (b,))
            a0, s0 = sch.alpha(gamma_0), sch.sigma(gamma_0)
            z_0_p = _inflate(a0) * xh_phar + _inflate(s0) * eps0_p
            z_0_q = _inflate(a0) * xh_pocket + _inflate(s0) * eps0_q
            net0_p, net0_q = self._apply(
                params, z_0_p, z_0_q, jnp.zeros((b, 1)), phar.mask,
                pocket.mask
            )
            loss0_x_p, loss0_x_q, loss0_h = self._neg_log_pxh_given_z0(
                phar, pocket, z_0_p, z_0_q, eps0_p, eps0_q, net0_p, net0_q,
                gamma_0
            )

        if self.size_prior is not None:
            log_pN = self.size_prior.log_prob(phar.size, pocket.size)
        else:
            log_pN = jnp.zeros((b,))

        if cfg.loss_type == "l2" and training:
            denom_p = (nd + self.phar_nf) * jnp.maximum(phar.size, 1.0)
            denom_q = (nd + self.residue_nf) * jnp.maximum(pocket.size, 1.0)
            loss_t = 0.5 * (error_t_phar / denom_p + error_t_pocket / denom_q)
            loss_0 = (
                loss0_x_p / (nd * jnp.maximum(phar.size, 1.0))
                + loss0_x_q / (nd * jnp.maximum(pocket.size, 1.0))
                + loss0_h
            )
            nll = loss_t + loss_0 + kl_prior
        else:
            loss_t = -cfg.timesteps * 0.5 * snr_weight * (
                error_t_phar + error_t_pocket
            )
            loss_0 = loss0_x_p + loss0_x_q + loss0_h + neg_log_constants
            nll = loss_t + loss_0 + kl_prior - delta_log_px - log_pN

        info = {
            "error_t_phar": jnp.mean(error_t_phar),
            "error_t_pocket": jnp.mean(error_t_pocket),
            "kl_prior": jnp.mean(kl_prior),
        }
        if return_terms:
            info["terms"] = {
                "delta_log_px": delta_log_px,
                "error_t_phar": error_t_phar,
                "error_t_pocket": error_t_pocket,
                "snr_weight": snr_weight,
                "loss0_x_p": loss0_x_p,
                "loss0_x_q": loss0_x_q,
                "loss0_h": loss0_h,
                "neg_log_constants": neg_log_constants,
                "kl_prior": kl_prior,
                "log_pN": log_pN,
                "t_int": t_int,
            }
        return nll, info

    def _kl_prior_with_pocket(self, params, xh_p, xh_q, mask_p, mask_q, n_total):
        nd = self.cfg.n_dims
        gamma_T = self._gammaT(params)
        alpha_T, sigma_T = sch.alpha(gamma_T), sch.sigma(gamma_T)
        mu_p, mu_q = alpha_T * xh_p, alpha_T * xh_q
        mu2_h = sum_except_batch(mu_p[..., nd:] ** 2, mask_p) + sum_except_batch(
            mu_q[..., nd:] ** 2, mask_q
        )
        mu2_x = sum_except_batch(mu_p[..., :nd] ** 2, mask_p) + sum_except_batch(
            mu_q[..., :nd] ** 2, mask_q
        )
        kl_h = _gaussian_kl(mu2_h, sigma_T, 1.0, 1.0)
        kl_x = _gaussian_kl(mu2_x, sigma_T, 1.0, self.subspace_dim(n_total))
        return kl_x + kl_h

    def _neg_log_pxh_given_z0(
        self, phar, pocket, z0_p, z0_q, eps_p, eps_q, net_p, net_q, gamma_0
    ):
        cfg = self.cfg
        nd = cfg.n_dims
        loss0_x_p = 0.5 * sum_except_batch(
            (eps_p[..., :nd] - net_p[..., :nd]) ** 2, phar.mask
        )
        loss0_x_q = 0.5 * sum_except_batch(
            (eps_q[..., :nd] - net_q[..., :nd]) ** 2, pocket.mask
        )
        sigma_0_cat = _inflate(sch.sigma(gamma_0) * cfg.norm_h)

        def log_ph(z, onehot_norm, mask):
            onehot = onehot_norm * cfg.norm_h + cfg.norm_bias_h
            est = z[..., nd:] * cfg.norm_h + cfg.norm_bias_h
            centered = est - 1.0
            logp = jnp.log(
                sch.cdf_standard_gaussian((centered + 0.5) / sigma_0_cat)
                - sch.cdf_standard_gaussian((centered - 0.5) / sigma_0_cat)
                + 1e-10
            )
            log_z = jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
            return sum_except_batch((logp - log_z) * onehot, mask)

        log_ph_total = log_ph(z0_p, phar.h, phar.mask) + log_ph(
            z0_q, pocket.h, pocket.mask
        )
        return loss0_x_p, loss0_x_q, -log_ph_total

    # ------------------------------------------------------------- sampling

    def _denoise_step(self, params, rng, z_p, z_q, s_int, t_int, mask_p,
                      mask_q, noise=None):
        """p(z_s | z_t) over both clouds (en_diffusion.py:499-553).

        ``noise``, when given as an ``(eps_p, eps_q)`` pair (already
        CoM-projected), replaces the standard-normal draw — used by the
        reference-transplant parity test; ``rng`` is then unread."""
        cfg = self.cfg
        nd = cfg.n_dims
        b = z_p.shape[0]
        gamma_s = jnp.broadcast_to(self._gamma_at_int(params, s_int), (b,))
        gamma_t = jnp.broadcast_to(self._gamma_at_int(params, t_int), (b,))
        s2_ts, s_ts, a_ts = sch.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        sigma_s, sigma_t = sch.sigma(gamma_s), sch.sigma(gamma_t)

        t_norm = jnp.full((b, 1), t_int / cfg.timesteps)
        eps_p, eps_q = self._apply(
            params, z_p, z_q, t_norm, mask_p, mask_q
        )
        if cfg.ddim_eta is not None:
            # DDIM family (same algebra as cddpm._reverse_scalars): eta=1
            # reduces to the ancestral coefficients by the VP identity,
            # eta=0 injects no fresh noise.
            sigma = cfg.ddim_eta * s_ts * sigma_s / sigma_t
            coef = _inflate(
                sigma_t / a_ts - jnp.sqrt(jnp.maximum(sigma_s**2 - sigma**2, 0.0))
            )
        else:
            coef = _inflate(s2_ts / a_ts / sigma_t)
            sigma = s_ts * sigma_s / sigma_t
        mu_p = z_p / _inflate(a_ts) - coef * eps_p
        mu_q = z_q / _inflate(a_ts) - coef * eps_q
        return self._sample_normal_joint(
            rng, mu_p, mu_q, sigma, mask_p, mask_q, noise=noise
        )

    def _renoise_step(self, params, rng, z_p, z_q, s_int, t_int, mask_p,
                      mask_q, noise=None):
        """q(z_t | z_s) jump for RePaint resampling (en_diffusion.py:457-497).

        ``noise``, when given as a CoM-projected ``(eps_p, eps_q)`` pair,
        replaces the standard-normal draw (reference-transplant parity
        test; ``rng`` is then unread)."""
        b = z_p.shape[0]
        gamma_s = jnp.broadcast_to(self._gamma_at_int(params, s_int), (b,))
        gamma_t = jnp.broadcast_to(self._gamma_at_int(params, t_int), (b,))
        s2_ts, s_ts, a_ts = sch.sigma_and_alpha_t_given_s(gamma_t, gamma_s)
        mu_p = _inflate(a_ts) * z_p
        mu_q = _inflate(a_ts) * z_q
        return self._sample_normal_joint(
            rng, mu_p, mu_q, s_ts, mask_p, mask_q, noise=noise
        )

    def _sample_normal_joint(self, rng, mu_p, mu_q, sigma, mask_p, mask_q,
                             noise=None):
        nd = self.cfg.n_dims
        if noise is not None:
            eps_p, eps_q = noise
        else:
            eps_p, eps_q = self._sample_joint_noise(rng, mask_p, mask_q)
        b = mu_p.shape[0]
        s = _inflate(jnp.broadcast_to(sigma, (b,)))
        z_p = mu_p + s * eps_p
        z_q = mu_q + s * eps_q
        zx_p, zx_q = _remove_mean_joint(
            z_p[..., :nd], z_q[..., :nd], mask_p, mask_q
        )
        z_p = jnp.concatenate([zx_p, z_p[..., nd:]], axis=-1)
        z_q = jnp.concatenate([zx_q, z_q[..., nd:]], axis=-1)
        return z_p, z_q

    def sample(self, params, rng, num_nodes_phar, num_nodes_pocket,
               n_phar_max: int, n_pocket_max: int,
               timesteps: Optional[int] = None):
        """Unconditional joint sampling (en_diffusion.py:576-647).
        ``timesteps`` < T runs a respaced chain (see
        cddpm.respaced_st_pairs); == T is the exact full chain."""
        from cmdgen_tpu.diffusion.cddpm import respaced_st_pairs

        cfg = self.cfg
        nd = cfg.n_dims
        T = cfg.timesteps if timesteps is None else min(timesteps, cfg.timesteps)
        b = num_nodes_phar.shape[0]
        mask_p = mask_from_sizes(num_nodes_phar, n_phar_max)
        mask_q = mask_from_sizes(num_nodes_pocket, n_pocket_max)
        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_p, z_q = self._sample_joint_noise(k_init, mask_p, mask_q)

        def step(carry, st):
            z_p, z_q, key = carry
            key, sub = jax.random.split(key)
            z_p, z_q = self._denoise_step(
                params, sub, z_p, z_q, st[0], st[1], mask_p, mask_q,
            )
            return (z_p, z_q, key), None

        (z_p, z_q, _), _ = jax.lax.scan(
            step, (z_p, z_q, k_scan), respaced_st_pairs(cfg.timesteps, T)
        )
        return self._finalize(params, k_final, z_p, z_q, mask_p, mask_q)

    def _finalize(self, params, rng, z_p, z_q, mask_p, mask_q, noise=None):
        """Final p(x, h | z0) + argmax types (en_diffusion.py:259-313).

        ``noise``, when given as a CoM-projected ``(eps_p, eps_q)`` pair,
        replaces the standard-normal draw (reference-transplant parity
        test; ``rng`` is then unread)."""
        cfg = self.cfg
        nd = cfg.n_dims
        b = z_p.shape[0]
        gamma_0 = jnp.broadcast_to(self._gamma0(params), (b,))
        sigma_x = sch.snr(-0.5 * gamma_0)
        net_p, net_q = self._apply(
            params, z_p, z_q, jnp.zeros((b, 1)), mask_p, mask_q
        )
        a0, s0 = sch.alpha(gamma_0), sch.sigma(gamma_0)
        mu_p = (z_p - _inflate(s0) * net_p) / _inflate(a0)
        mu_q = (z_q - _inflate(s0) * net_q) / _inflate(a0)
        xh_p, xh_q = self._sample_normal_joint(
            rng, mu_p, mu_q, sigma_x, mask_p, mask_q, noise=noise
        )
        x_p = self.unnormalize_x(xh_p[..., :nd])
        x_q = self.unnormalize_x(xh_q[..., :nd])
        h_p = jax.nn.one_hot(
            jnp.argmax(z_p[..., nd:], axis=-1), self.phar_nf
        ) * mask_p[..., None]
        h_q = jax.nn.one_hot(
            jnp.argmax(z_q[..., nd:], axis=-1), self.residue_nf
        ) * mask_q[..., None]
        x_p, x_q = _remove_mean_joint(x_p, x_q, mask_p, mask_q)
        return (
            PointCloud(x=x_p, h=h_p, mask=mask_p),
            PointCloud(x=x_q, h=h_q, mask=mask_q),
        )

    def inpaint(
        self,
        params,
        rng,
        phar: PointCloud,
        pocket: PointCloud,
        phar_fixed: jnp.ndarray,    # [B, Np] 1 = keep from input
        pocket_fixed: jnp.ndarray,  # [B, Nq]
        resamplings: int = 1,
        jump_length: int = 1,
        timesteps: Optional[int] = None,
    ) -> Tuple[PointCloud, PointCloud]:
        """RePaint inpainting (en_diffusion.py:672-831). The pocket-fixed
        generation path of the joint model sets phar_fixed=0, pocket_fixed=1
        (lightning_modules.py:466-486)."""
        cfg = self.cfg
        nd = cfg.n_dims
        T = cfg.timesteps if timesteps is None else timesteps
        b = phar.batch
        phar = self.normalize(phar)
        pocket = self.normalize(pocket)

        fixed_p = phar_fixed * phar.mask
        fixed_q = pocket_fixed * pocket.mask

        def fixed_mean(x_p, x_q):
            total = jnp.sum(x_p * fixed_p[..., None], -2) + jnp.sum(
                x_q * fixed_q[..., None], -2
            )
            count = jnp.sum(fixed_p, -1) + jnp.sum(fixed_q, -1)
            return total / jnp.maximum(count, 1.0)[..., None]

        # center on the CoM of the known part (en_diffusion.py:700-712)
        mean_known = fixed_mean(phar.x, pocket.x)
        xh0_p = jnp.concatenate(
            [(phar.x - mean_known[:, None, :]) * phar.mask[..., None], phar.h],
            axis=-1,
        )
        xh0_q = jnp.concatenate(
            [
                (pocket.x - mean_known[:, None, :]) * pocket.mask[..., None],
                pocket.h,
            ],
            axis=-1,
        )

        k_init, k_scan, k_final = jax.random.split(rng, 3)
        z_p, z_q = self._sample_joint_noise(k_init, phar.mask, pocket.mask)

        kinds, svals = repaint_ops(resamplings, jump_length, T)

        def combine_known(key, z_p_un, z_q_un, s_int):
            """Noise the known part to level s and splice it in, CoM-aligned
            (en_diffusion.py:736-781)."""
            gamma_s = jnp.broadcast_to(self._gamma_at_int(params, s_int), (b,))
            a_s, s_s = sch.alpha(gamma_s), sch.sigma(gamma_s)
            eps_p, eps_q = self._sample_joint_noise(key, phar.mask, pocket.mask)
            zk_p = _inflate(a_s) * xh0_p + _inflate(s_s) * eps_p
            zk_q = _inflate(a_s) * xh0_q + _inflate(s_s) * eps_q
            com_noised = fixed_mean(zk_p[..., :nd], zk_q[..., :nd])
            com_denoised = fixed_mean(z_p_un[..., :nd], z_q_un[..., :nd])
            shift = com_denoised - com_noised
            zk_p = jnp.concatenate(
                [zk_p[..., :nd] + shift[:, None, :], zk_p[..., nd:]], -1
            )
            zk_q = jnp.concatenate(
                [zk_q[..., :nd] + shift[:, None, :], zk_q[..., nd:]], -1
            )
            z_p = zk_p * fixed_p[..., None] + z_p_un * (1 - fixed_p[..., None])
            z_q = zk_q * fixed_q[..., None] + z_q_un * (1 - fixed_q[..., None])
            return z_p, z_q

        def step(carry, op):
            z_p, z_q, key = carry
            kind, s = op
            key, k1, k2 = jax.random.split(key, 3)

            def denoise(zs):
                z_p, z_q = zs
                z_p_un, z_q_un = self._denoise_step(
                    params, k1, z_p, z_q, s.astype(jnp.float32),
                    (s + 1).astype(jnp.float32), phar.mask, pocket.mask,
                )
                return combine_known(k2, z_p_un, z_q_un, s.astype(jnp.float32))

            def renoise(zs):
                z_p, z_q = zs
                return self._renoise_step(
                    params, k1, z_p, z_q, s.astype(jnp.float32),
                    (s + jump_length).astype(jnp.float32),
                    phar.mask, pocket.mask,
                )

            z_p, z_q = jax.lax.cond(kind == 0, denoise, renoise, (z_p, z_q))
            return (z_p, z_q, key), None

        (z_p, z_q, _), _ = jax.lax.scan(
            step,
            (z_p, z_q, k_scan),
            (jnp.asarray(kinds), jnp.asarray(svals)),
        )
        return self._finalize(params, k_final, z_p, z_q, phar.mask, pocket.mask)
