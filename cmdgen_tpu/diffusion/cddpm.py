"""Pocket-conditional E(3) DDPM over pharmacophore point clouds.

Behavioral equivalent of ConditionalDDPM / SimpleConditionalDDPM
(DiffPhar/equivariant_diffusion/conditional_model.py:12-525, inheriting the
VDM algebra of en_diffusion.py). Only the pharmacophore nodes are diffused;
the pocket is fixed context. The CoM-free subspace trick subtracts the
pharmacophore CoM from both clouds at every step.

TPU-native design decisions:
- all state is fixed-shape padded ``[B, N, ...]`` (see containers.py);
- the full reverse chain is one ``lax.scan`` over T steps — zero host
  round-trips per sample, unlike the reference's Python loop
  (conditional_model.py:428-436);
- the reference's *conditional* CoG-drift correction (project only when
  drift > 5e-2, conditional_model.py:451-457) becomes an unconditional
  projection: it is idempotent on already-centered clouds, so behavior is
  identical up to float noise and the graph stays branch-free;
- randomness flows through explicit jax.random keys.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.gamma_net import GammaNetwork
from cmdgen_tpu.diffusion.size_prior import SizePrior
from cmdgen_tpu.models.dynamics import EGNNDynamics
from cmdgen_tpu.ops import schedules as sch
from cmdgen_tpu.ops.masked import (
    masked_mean,
    remove_mean_conditional,
    sum_except_batch,
)


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    timesteps: int = 100
    noise_schedule: str = "polynomial_2"
    noise_precision: float = 1e-5
    loss_type: str = "l2"  # 'l2' | 'vlb'
    norm_x: float = 1.0    # normalize_factors[0]
    norm_h: float = 4.0    # normalize_factors[1]
    norm_bias_h: float = 0.0
    com_free: bool = True  # False => SimpleConditionalDDPM (no subspace trick)
    n_dims: int = 3
    # Stratified (low-discrepancy) timestep sampling: one uniform offset
    # strides the batch across {lowest_t..T} instead of iid draws. Each
    # sample's marginal stays exactly uniform; the per-batch gradient
    # variance drops (VDM appendix-style trick). Off by default — the
    # reference samples iid (conditional_model.py:213).
    stratified_t: bool = False
    # Static coordinate thresholding during SAMPLING only (Imagen-style):
    # clamp the coordinate channels of z to ±clamp_x (normalized units,
    # = Å at norm_x=1) after every reverse step. Bounds the compounding
    # of eps-prediction error through the 1/alpha amplification at high t
    # (PERF.md round-2 diagnosis) for under-trained models. None = off
    # (the reference has no equivalent; its models are trained to ~1000
    # epochs where the cancellation holds on its own).
    clamp_x: Optional[float] = None
    # DDIM sampling (Song et al. 2021), SAMPLING only: None = ancestral
    # DDPM (the reference sampler, conditional_model.py:342-386); a float
    # eta in [0, 1] switches the reverse chain to the DDIM family with
    # posterior width eta * sigma_ts*sigma_s/sigma_t. eta=1 reproduces the
    # ancestral coefficients EXACTLY (VP identity: sigma_t^2 - sigma_ts^2
    # = alpha_ts^2 sigma_s^2 => sqrt(sigma_s^2 - sigma_post^2) =
    # alpha_ts sigma_s^2 / sigma_t; tested), eta=0 is the deterministic
    # probability-flow corner — no fresh noise is injected, so the
    # 1/alpha_ts error compounding acts on the model's eps error alone,
    # which tightens sample spread for under-trained models.
    ddim_eta: Optional[float] = None


def _inflate(v: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [B,1,1] for broadcasting against [B,N,F]."""
    return v[:, None, None]


class ConditionalDDPM:
    """Loss and samplers for the pocket-conditional diffusion model.

    ``dynamics`` is the flax EGNNDynamics module; its params are passed to
    every method so the object itself is static/hashable under jit.
    """

    def __init__(self, cfg: DDPMConfig, dynamics: EGNNDynamics,
                 size_prior: Optional[SizePrior] = None,
                 apply_fn=None):
        self.cfg = cfg
        self.dynamics = dynamics
        self.size_prior = size_prior
        # apply_fn overrides the denoiser forward (e.g. the fused Pallas
        # path from models.dynamics.make_pallas_apply); same signature as
        # dynamics.apply
        self._apply = apply_fn if apply_fn is not None else dynamics.apply
        if cfg.noise_schedule == "learned":
            # learned monotone gamma(t), trained through the vlb
            # (en_diffusion.py:29-41: 'learned' requires loss_type 'vlb')
            assert cfg.loss_type == "vlb", (
                "noise_schedule='learned' requires loss_type='vlb'"
            )
            self.gamma_net: Optional[GammaNetwork] = GammaNetwork()
            self.gamma = None
        else:
            self.gamma_net = None
            self.gamma = sch.gamma_table(
                cfg.noise_schedule, cfg.timesteps, cfg.noise_precision
            )
        self.phar_nf = dynamics.cfg.phar_nf

    def init_extra_params(self, rng: jax.Array, params):
        """Merge learned-schedule params into freshly-initialized dynamics
        variables (no-op for predefined schedules). The gamma-net subtree
        lives under params['params']['gamma_net'], alongside the dynamics
        modules, so one optimizer trains both — the flax apply of the
        dynamics simply never reads it."""
        if self.gamma_net is None:
            return params
        gp = self.gamma_net.init(rng, jnp.zeros((1, 1)))["params"]
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["gamma_net"] = gp
        return params

    def check_norm_values(self, params, num_stdevs: int = 8):
        """Reference guard en_diffusion.py:64-77: with discretized-h
        likelihoods, ``num_stdevs`` sigmas of noise at t=0 must stay below
        one normalized one-hot unit, else p(h|z0) rounds across categories
        and training silently degrades. Raises ValueError when norm_h is
        too large for the schedule's gamma_0. Skipped for the learned
        schedule, as the reference does (en_diffusion.py:229-230) — a
        random-init GammaNetwork's gamma_0 is meaningless."""
        if self.gamma_net is not None:
            return
        sigma_0 = float(sch.sigma(self._gamma0(params)))
        if sigma_0 * self.cfg.norm_h * num_stdevs > 1.0:
            raise ValueError(
                f"norm_h={self.cfg.norm_h} too large for this noise "
                f"schedule: {num_stdevs}*sigma_0*norm_h = "
                f"{sigma_0 * self.cfg.norm_h * num_stdevs:.3f} > 1 — "
                "lower norm_h or sharpen gamma_0 (en_diffusion.py:64-77)"
            )

    # ---------------------------------------------------------------- utils

    def normalize(self, pc: PointCloud) -> PointCloud:
        cfg = self.cfg
        return pc.replace(
            x=pc.x / cfg.norm_x,
            h=(pc.h - cfg.norm_bias_h) / cfg.norm_h,
        )

    def unnormalize_x(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.cfg.norm_x

    def unnormalize_h(self, h: jnp.ndarray) -> jnp.ndarray:
        return h * self.cfg.norm_h + self.cfg.norm_bias_h

    def subspace_dim(self, n: jnp.ndarray) -> jnp.ndarray:
        """Translation-invariant subspace dimensionality
        (en_diffusion.py:903-906; SimpleConditionalDDPM override 481-489)."""
        if self.cfg.com_free:
            return (n - 1.0) * self.cfg.n_dims
        return n * self.cfg.n_dims

    def _center(self, x_phar, x_pocket, mask_phar, mask_pocket):
        """Subtract pharmacophore CoM from both clouds (no-op without the
        subspace trick, conditional_model.py:509-516)."""
        if self.cfg.com_free:
            return remove_mean_conditional(x_phar, x_pocket, mask_phar, mask_pocket)
        return x_phar * mask_phar[..., None], x_pocket * mask_pocket[..., None]

    def _gamma_t_norm(self, params, t_norm) -> jnp.ndarray:
        """gamma at normalized time t in [0, 1] (clamped), any shape."""
        t = jnp.clip(jnp.asarray(t_norm, jnp.float32), 0.0, 1.0)
        if self.gamma_net is None:
            return sch.gamma_at(self.gamma, t)
        g = self.gamma_net.apply(
            {"params": params["params"]["gamma_net"]},
            jnp.reshape(t, (-1, 1)),
        )
        return jnp.reshape(g, t.shape)

    def _gamma_at_int(self, params, t_int: jnp.ndarray) -> jnp.ndarray:
        return self._gamma_t_norm(params, t_int / self.cfg.timesteps)

    def _gamma0(self, params) -> jnp.ndarray:
        return self._gamma_t_norm(params, jnp.zeros(()))

    def _gammaT(self, params) -> jnp.ndarray:
        return self._gamma_t_norm(params, jnp.ones(()))

    # ----------------------------------------------------------------- loss

    def loss(
        self,
        params,
        rng: jax.Array,
        phar: PointCloud,
        pocket: PointCloud,
        training: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Per-example NLL/loss, assembled exactly like the reference
        (conditional_model.py:198-320 + lightning_modules.py:188-239).

        Returns (nll [B], info dict).
        """
        cfg = self.cfg
        b = phar.batch
        k_t, k_eps, k_eps0 = jax.random.split(rng, 3)
        lowest_t = 0 if training else 1
        t_int = sample_t_int(
            k_t, b, lowest_t, cfg.timesteps, stratified=cfg.stratified_t
        )
        shape = (*phar.mask.shape, cfg.n_dims + self.phar_nf)
        eps = jax.random.normal(k_eps, shape) * phar.mask[..., None]
        eps0 = jax.random.normal(k_eps0, shape) * phar.mask[..., None]
        return self.loss_given_noise(
            params, phar, pocket, t_int, eps, eps0, training
        )

    def loss_given_noise(
        self,
        params,
        phar: PointCloud,
        pocket: PointCloud,
        t_int: jnp.ndarray,
        eps: jnp.ndarray,
        eps0: jnp.ndarray,
        training: bool = True,
        return_terms: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Deterministic half of :meth:`loss`: the NLL given explicit
        per-sample timesteps ``t_int`` [B] and standard-normal draws
        ``eps``/``eps0`` [B, N, n_dims+phar_nf] (``eps0`` is only read on
        the eval path's second t=0 forward). Split out so the reference-
        transplant parity test (tests/test_reference_parity.py) can drive
        identical randomness through this and the reference's
        conditional_model.py:198-320. ``return_terms`` adds the raw
        per-sample loss terms to the info dict."""
        cfg = self.cfg
        nd = cfg.n_dims
        b = phar.batch

        phar = self.normalize(phar)
        pocket = self.normalize(pocket)

        if not cfg.com_free:
            # simple variant: move to the pocket-CoM frame first
            pocket_com = masked_mean(pocket.x, pocket.mask)
            phar = phar.replace(x=phar.x - pocket_com[:, None, :])
            pocket = pocket.replace(x=pocket.x - pocket_com[:, None, :])

        n_phar = phar.size
        delta_log_px = -self.subspace_dim(n_phar) * math.log(cfg.norm_x)

        t_int = jnp.asarray(t_int, jnp.float32)
        s_int = t_int - 1.0
        t_is_zero = (t_int == 0).astype(jnp.float32)
        t_is_not_zero = 1.0 - t_is_zero

        gamma_s = self._gamma_at_int(params, s_int)  # [B]; s=-1 never used at t=0
        gamma_t = self._gamma_at_int(params, t_int)

        # center input on pharmacophore CoM
        x_phar_c, x_pocket_c = self._center(
            phar.x, pocket.x, phar.mask, pocket.mask
        )
        xh0_phar = jnp.concatenate([x_phar_c, phar.h], axis=-1)
        xh0_pocket = jnp.concatenate([x_pocket_c, pocket.h], axis=-1)

        # q(z_t | x): noise only the pharmacophore nodes
        alpha_t, sigma_t = sch.alpha(gamma_t), sch.sigma(gamma_t)
        z_t = _inflate(alpha_t) * xh0_phar + _inflate(sigma_t) * eps
        z_t_x, xh_pocket_x = self._center(
            z_t[..., :nd], xh0_pocket[..., :nd], phar.mask, pocket.mask
        )
        z_t = jnp.concatenate([z_t_x, z_t[..., nd:]], axis=-1)
        xh_pocket = jnp.concatenate([xh_pocket_x, xh0_pocket[..., nd:]], axis=-1)

        t_norm = (t_int / cfg.timesteps)[:, None]
        net_out, _ = self._apply(
            params, z_t, xh_pocket, t_norm, phar.mask, pocket.mask
        )

        error_t = sum_except_batch((eps - net_out) ** 2, phar.mask)
        snr_weight = 1.0 - sch.snr(gamma_s - gamma_t)  # negative, by design

        # constants of the L0 cross-entropy term (en_diffusion.py:170-180)
        gamma_0_scalar = self._gamma0(params)
        d_x = self.subspace_dim(n_phar)
        neg_log_constants = -d_x * (
            -0.5 * gamma_0_scalar - 0.5 * math.log(2 * math.pi)
        )

        kl_prior = self._kl_prior(params, xh0_phar, phar.mask, n_phar)

        if training:
            loss0_x, loss0_h = self._neg_log_pxh_given_z0(
                phar, z_t, eps, net_out, gamma_t
            )
            loss0_x = loss0_x * t_is_zero
            loss0_h = loss0_h * t_is_zero
            error_t = error_t * t_is_not_zero
        else:
            # second forward pass at t=0 for a lower-variance L0 estimate
            gamma_0 = jnp.broadcast_to(self._gamma0(params), (b,))
            a0, s0 = sch.alpha(gamma_0), sch.sigma(gamma_0)
            z_0 = _inflate(a0) * xh0_phar + _inflate(s0) * eps0
            z_0_x, xh_pocket0_x = self._center(
                z_0[..., :nd], xh0_pocket[..., :nd], phar.mask, pocket.mask
            )
            z_0 = jnp.concatenate([z_0_x, z_0[..., nd:]], axis=-1)
            xh_pocket0 = jnp.concatenate(
                [xh_pocket0_x, xh0_pocket[..., nd:]], axis=-1
            )
            net_out0, _ = self._apply(
                params, z_0, xh_pocket0, jnp.zeros((b, 1)), phar.mask, pocket.mask
            )
            loss0_x, loss0_h = self._neg_log_pxh_given_z0(
                phar, z_0, eps0, net_out0, gamma_0
            )

        if self.size_prior is not None:
            log_pN = self.size_prior.log_prob_n1_given_n2(n_phar, pocket.size)
        else:
            log_pN = jnp.zeros((b,))

        # ---- assembly (lightning_modules.py:196-231)
        if cfg.loss_type == "l2" and training:
            denom = (nd + self.phar_nf) * jnp.maximum(n_phar, 1.0)
            loss_t = 0.5 * error_t / denom
            loss_0 = loss0_x / (nd * jnp.maximum(n_phar, 1.0)) + loss0_h
            nll = loss_t + loss_0 + kl_prior
        else:
            loss_t = -cfg.timesteps * 0.5 * snr_weight * error_t
            loss_0 = loss0_x + loss0_h + neg_log_constants
            nll = loss_t + loss_0 + kl_prior
            nll = nll - delta_log_px - log_pN

        info = {
            "error_t": jnp.mean(error_t),
            "snr_weight": jnp.mean(snr_weight),
            "loss_0": jnp.mean(loss_0),
            "kl_prior": jnp.mean(kl_prior),
            "neg_log_const_0": jnp.mean(neg_log_constants),
            "log_pN": jnp.mean(log_pN),
            "delta_log_px": jnp.mean(delta_log_px),
            "eps_hat_x": jnp.mean(
                jnp.sum(jnp.abs(net_out[..., :nd]), axis=(-1, -2))
                / (nd * jnp.maximum(n_phar, 1.0))
            ),
        }
        if return_terms:
            info["terms"] = {
                "delta_log_px": delta_log_px,
                "error_t": error_t,
                "snr_weight": snr_weight,
                "loss0_x": loss0_x,
                "loss0_h": loss0_h,
                "neg_log_constants": neg_log_constants,
                "kl_prior": kl_prior,
                "log_pN": log_pN,
                "t_int": t_int,
            }
        return nll, info

    def _kl_prior(self, params, xh0_phar, mask_phar, n_phar):
        """KL(q(z_T | x) || N(0, I)) (conditional_model.py:20-57)."""
        cfg = self.cfg
        nd = cfg.n_dims
        gamma_T = self._gammaT(params)
        alpha_T = sch.alpha(gamma_T)
        sigma_T = sch.sigma(gamma_T)
        mu_T = alpha_T * xh0_phar
        mu_norm2_h = sum_except_batch(mu_T[..., nd:] ** 2, mask_phar)
        mu_norm2_x = sum_except_batch(mu_T[..., :nd] ** 2, mask_phar)
        kl_h = _gaussian_kl(mu_norm2_h, sigma_T, 1.0, 1.0)
        d_x = self.subspace_dim(n_phar)
        kl_x = _gaussian_kl(mu_norm2_x, sigma_T, 1.0, d_x)
        return kl_x + kl_h

    def _neg_log_pxh_given_z0(self, phar, z_0, eps, net_out, gamma_0):
        """-log p(x, h | z0) without constants
        (conditional_model.py:59-108). Returns (loss0_x [B], loss0_h [B])."""
        cfg = self.cfg
        nd = cfg.n_dims
        eps_x = eps[..., :nd]
        net_x = net_out[..., :nd]
        loss0_x = 0.5 * sum_except_batch((eps_x - net_x) ** 2, phar.mask)

        sigma_0 = sch.sigma(gamma_0)  # [B]
        sigma_0_cat = _inflate(sigma_0 * cfg.norm_h)
        phar_onehot = self.unnormalize_h(phar.h)
        est_onehot = self.unnormalize_h(z_0[..., nd:])
        centered = est_onehot - 1.0
        log_ph_prop = jnp.log(
            sch.cdf_standard_gaussian((centered + 0.5) / sigma_0_cat)
            - sch.cdf_standard_gaussian((centered - 0.5) / sigma_0_cat)
            + 1e-10
        )
        log_z = jax.scipy.special.logsumexp(log_ph_prop, axis=-1, keepdims=True)
        log_probs = log_ph_prop - log_z
        log_ph = sum_except_batch(log_probs * phar_onehot, phar.mask)
        return loss0_x, -log_ph

    # ------------------------------------------------------------- sampling

    def _denoise_step(
        self, params, rng, z_phar, xh_pocket, s_int, t_int, phar_mask,
        pocket_mask, noise=None,
    ):
        """One reverse step z_t -> z_s (conditional_model.py:342-386).

        ``noise``, when given, replaces the standard-normal draw (used by
        the reference-transplant parity test to feed both implementations
        the same randomness; ``rng`` is then unread)."""
        cfg = self.cfg
        nd = cfg.n_dims
        b = z_phar.shape[0]
        gamma_s = jnp.broadcast_to(self._gamma_at_int(params, s_int), (b,))
        gamma_t = jnp.broadcast_to(self._gamma_at_int(params, t_int), (b,))
        sigma2_ts, sigma_ts, alpha_ts = sch.sigma_and_alpha_t_given_s(
            gamma_t, gamma_s
        )
        sigma_s = sch.sigma(gamma_s)
        sigma_t = sch.sigma(gamma_t)

        t_norm = jnp.full((b, 1), t_int / cfg.timesteps)
        eps_hat, _ = self._apply(
            params, z_phar, xh_pocket, t_norm, phar_mask, pocket_mask
        )
        mu = z_phar / _inflate(alpha_ts) - _inflate(
            sigma2_ts / alpha_ts / sigma_t
        ) * eps_hat
        sigma = sigma_ts * sigma_s / sigma_t
        if noise is not None:
            return self._normal_zero_com_eps(
                noise, mu, xh_pocket, sigma, phar_mask, pocket_mask
            )
        return self._sample_normal_zero_com(
            rng, mu, xh_pocket, sigma, phar_mask, pocket_mask
        )

    def _reverse_scalars(self, params, st_pairs: jnp.ndarray) -> jnp.ndarray:
        """Per-step reverse-kernel scalars for a whole (s, t) chain at once.

        st_pairs: [S, 2] -> [S, 4] rows (t_norm, 1/alpha_ts, eps coefficient
        sigma2_ts/(alpha_ts*sigma_t), posterior sigma_ts*sigma_s/sigma_t).
        Hoisting this out of the sampling scan removes the per-step gamma
        lookups and scalar algebra from the loop body (the no-op-denoiser
        sampler floor was 0.58 ms/step, a third of the round-3 step time);
        exact — the same closed forms (conditional_model.py:342-386),
        evaluated vectorized. Works for both the lookup-table and learned
        GammaNetwork schedules (both are pure maps over t)."""
        T = self.cfg.timesteps
        gamma_s = self._gamma_t_norm(params, st_pairs[:, 0] / T)
        gamma_t = self._gamma_t_norm(params, st_pairs[:, 1] / T)
        sigma2_ts, sigma_ts, alpha_ts = sch.sigma_and_alpha_t_given_s(
            gamma_t, gamma_s
        )
        sigma_s, sigma_t = sch.sigma(gamma_s), sch.sigma(gamma_t)
        if self.cfg.ddim_eta is not None:
            # DDIM family: z_s = (alpha_s/alpha_t) z_t
            #   - (sigma_t/alpha_ts - sqrt(sigma_s^2 - sigma_post^2)) eps_hat
            #   + sigma_post * eps,  sigma_post = eta * sigma_ts sigma_s/sigma_t.
            # Same scan body as ancestral — only these rows change; eta=1
            # reduces to the ancestral coefficients by the VP identity.
            sigma_post = self.cfg.ddim_eta * sigma_ts * sigma_s / sigma_t
            eps_coeff = sigma_t / alpha_ts - jnp.sqrt(
                jnp.maximum(sigma_s**2 - sigma_post**2, 0.0)
            )
            return jnp.stack(
                [st_pairs[:, 1] / T, 1.0 / alpha_ts, eps_coeff, sigma_post],
                axis=-1,
            )
        return jnp.stack(
            [
                st_pairs[:, 1] / T,
                1.0 / alpha_ts,
                sigma2_ts / (alpha_ts * sigma_t),
                sigma_ts * sigma_s / sigma_t,
            ],
            axis=-1,
        )

    def _sample_normal_zero_com(
        self, rng, mu_phar, xh_pocket, sigma, phar_mask, pocket_mask
    ):
        """Sample around mu and re-project to the CoM-free subspace
        (conditional_model.py:136-156)."""
        eps = jax.random.normal(rng, mu_phar.shape)
        return self._normal_zero_com_eps(
            eps, mu_phar, xh_pocket, sigma, phar_mask, pocket_mask
        )

    def _normal_zero_com_eps(
        self, eps, mu_phar, xh_pocket, sigma, phar_mask, pocket_mask
    ):
        """_sample_normal_zero_com with the standard-normal draw passed in
        (lets the sampling scan consume pre-generated noise instead of
        running threefry in every loop iteration)."""
        nd = self.cfg.n_dims
        eps = eps * phar_mask[..., None]
        out = mu_phar + _inflate(jnp.broadcast_to(sigma, (mu_phar.shape[0],))) * eps
        if self.cfg.clamp_x is not None:
            out = jnp.concatenate(
                [jnp.clip(out[..., :nd], -self.cfg.clamp_x, self.cfg.clamp_x),
                 out[..., nd:]], axis=-1,
            )
        out_x, pocket_x = self._center(
            out[..., :nd], xh_pocket[..., :nd], phar_mask, pocket_mask
        )
        out = jnp.concatenate([out_x, out[..., nd:]], axis=-1)
        xh_pocket = jnp.concatenate([pocket_x, xh_pocket[..., nd:]], axis=-1)
        return out, xh_pocket

    def _final_decode(
        self, params, rng, z_phar, xh_pocket, phar_mask, pocket_mask,
        noise=None,
    ):
        """Final p(x, h | z0) decode (conditional_model.py:107-131): one
        denoiser call at t=0, x from the EDM x-prediction plus sigma_0
        zero-CoM noise, discrete types from z0's h channels by argmax
        (unnormalization is channel-monotone, so argmax commutes with it).
        Returns (x_phar, h_phar, x_pocket, h_pocket) in data scale.

        ``noise``, when given, replaces the standard-normal draw (used by
        the reference-transplant parity test; ``rng`` is then unread)."""
        cfg = self.cfg
        nd = cfg.n_dims
        b = z_phar.shape[0]
        gamma_0 = jnp.broadcast_to(self._gamma0(params), (b,))
        sigma_x = sch.snr(-0.5 * gamma_0)
        t_zeros = jnp.zeros((b, 1))
        net_out, _ = self._apply(
            params, z_phar, xh_pocket, t_zeros, phar_mask, pocket_mask
        )
        a0, s0 = sch.alpha(gamma_0), sch.sigma(gamma_0)
        mu_x_final = (z_phar - _inflate(s0) * net_out) / _inflate(a0)
        if noise is not None:
            xh_phar, xh_pocket = self._normal_zero_com_eps(
                noise, mu_x_final, xh_pocket, sigma_x, phar_mask, pocket_mask
            )
        else:
            xh_phar, xh_pocket = self._sample_normal_zero_com(
                rng, mu_x_final, xh_pocket, sigma_x, phar_mask, pocket_mask
            )
        x_phar = self.unnormalize_x(xh_phar[..., :nd])
        h_logits = self.unnormalize_h(z_phar[..., nd:])
        h_phar = jax.nn.one_hot(jnp.argmax(h_logits, axis=-1), self.phar_nf)
        x_pocket = self.unnormalize_x(xh_pocket[..., :nd])
        h_pocket = self.unnormalize_h(xh_pocket[..., nd:])
        return x_phar, h_phar, x_pocket, h_pocket

    def sample_given_pocket(
        self,
        params,
        rng: jax.Array,
        pocket: PointCloud,
        num_nodes_phar: jnp.ndarray,
        n_phar_max: int,
        timesteps: Optional[int] = None,
    ) -> Tuple[PointCloud, PointCloud]:
        """Ancestral sampling of pharmacophore clouds for given pockets.

        Equivalent of conditional_model.py:412-475 with the T-step Python
        loop replaced by one on-device lax.scan.

        ``timesteps`` < the training T runs a RESPACED reverse chain: the
        (s, t) pairs stride an evenly-spaced subsequence of the full
        schedule (tau_0=0 < ... < tau_S=T), using the same closed-form
        q(z_s | z_t, x) transition — `_denoise_step` is valid for any
        s < t. (Plain truncation — running only the last S integer steps
        from a z ~ N(0, I) init — is inconsistent with gamma_S and was the
        round-1 behavior.) timesteps == T reproduces the full chain
        exactly.

        Returns (phar, pocket_out) in *model* scale already unnormalized;
        pocket_out may be translated relative to the input (the caller
        shifts back by the pocket-CoM difference, as the reference does in
        lightning_modules.py:497-504).
        """
        cfg = self.cfg
        nd = cfg.n_dims
        T = cfg.timesteps if timesteps is None else min(timesteps, cfg.timesteps)
        b = pocket.batch
        pocket = self.normalize(pocket)

        if not cfg.com_free:
            pocket_com = masked_mean(pocket.x, pocket.mask)
            pocket = pocket.replace(x=pocket.x - pocket_com[:, None, :])

        phar_mask = mask_from_sizes(num_nodes_phar, n_phar_max)
        xh0_pocket = pocket.xh

        # init: z ~ N(pocket CoM, I), then CoM-projected
        k_init, k_scan, k_final = jax.random.split(rng, 3)
        mu_x = jnp.broadcast_to(
            masked_mean(pocket.x, pocket.mask)[:, None, :], (b, n_phar_max, nd)
        )
        mu_h = jnp.zeros((b, n_phar_max, self.phar_nf))
        mu = jnp.concatenate([mu_x, mu_h], axis=-1) * phar_mask[..., None]
        z_phar, xh_pocket = self._sample_normal_zero_com(
            k_init, mu, xh0_pocket, jnp.ones(()), phar_mask, pocket.mask
        )

        # per-step schedule scalars and the whole chain's noise are computed
        # once outside the scan (exact; see _reverse_scalars)
        st_pairs = respaced_st_pairs(cfg.timesteps, T)
        scalars = self._reverse_scalars(params, st_pairs)
        eps_all = jax.random.normal(
            k_scan, (st_pairs.shape[0], *z_phar.shape)
        )

        def step(carry, xs):
            z, xh_pkt = carry
            sc, eps = xs
            eps_hat, _ = self._apply(
                params, z, xh_pkt,
                jnp.full((b, 1), sc[0]), phar_mask, pocket.mask,
            )
            mu = z * sc[1] - sc[2] * eps_hat
            z, xh_pkt = self._normal_zero_com_eps(
                eps, mu, xh_pkt, sc[3], phar_mask, pocket.mask
            )
            return (z, xh_pkt), None

        (z_phar, xh_pocket), _ = jax.lax.scan(
            step, (z_phar, xh_pocket), (scalars, eps_all)
        )

        x_phar, h_phar, x_pocket, h_pocket = self._final_decode(
            params, k_final, z_phar, xh_pocket, phar_mask, pocket.mask
        )

        # unconditional CoG projection replaces the reference's drift check
        if cfg.com_free:
            x_phar, x_pocket = remove_mean_conditional(
                x_phar, x_pocket, phar_mask, pocket.mask
            )

        phar_out = PointCloud(x=x_phar, h=h_phar * phar_mask[..., None], mask=phar_mask)
        pocket_out = PointCloud(x=x_pocket, h=h_pocket, mask=pocket.mask)
        return phar_out, pocket_out


def sample_t_int(key, b: int, lowest_t: int, timesteps: int,
                 stratified: bool = False) -> jnp.ndarray:
    """Draw [B] integer diffusion times from {lowest_t..timesteps}, as
    float32. iid uniform by default; ``stratified`` strides one uniform
    offset across the batch (per-sample marginal unchanged)."""
    if not stratified:
        return jax.random.randint(
            key, (b,), lowest_t, timesteps + 1
        ).astype(jnp.float32)
    u0 = jax.random.uniform(key, ())
    u = (u0 + jnp.arange(b, dtype=jnp.float32) / b) % 1.0
    n_vals = timesteps + 1 - lowest_t
    return jnp.floor(u * n_vals) + lowest_t


def respaced_st_pairs(t_full: int, s_steps: int) -> jnp.ndarray:
    """(s, t) step pairs for a respaced reverse chain: an evenly spaced
    subsequence tau_0=0 < ... < tau_S = t_full of the training schedule,
    returned as [S, 2] float32 rows (s, t) ordered from t = t_full down.
    s_steps == t_full reduces to the standard (t-1, t) ancestral chain."""
    taus = np.round(np.linspace(0.0, t_full, s_steps + 1)).astype(np.float32)
    pairs = np.stack([taus[:-1], taus[1:]], axis=-1)[::-1]
    return jnp.asarray(pairs.copy())


def sample_chain_given_pocket(
    model: "ConditionalDDPM",
    params,
    rng: jax.Array,
    pocket: PointCloud,
    num_nodes_phar: jnp.ndarray,
    n_phar_max: int,
    keep_frames: int = 100,
    timesteps: Optional[int] = None,
):
    """Reverse-chain sampling that also returns intermediate frames for
    visualization (the reference's return_frames/keep_frames path,
    conditional_model.py:423-443 + visualize_chain). Returns
    (phar, pocket_out, frames [F, B, N, 3] unnormalized x coordinates)."""
    cfg = model.cfg
    nd = cfg.n_dims
    T = cfg.timesteps if timesteps is None else min(timesteps, cfg.timesteps)
    b = pocket.batch
    pocket_n = model.normalize(pocket)
    phar_mask = mask_from_sizes(num_nodes_phar, n_phar_max)
    k_init, k_scan, k_final = jax.random.split(rng, 3)
    mu_x = jnp.broadcast_to(
        masked_mean(pocket_n.x, pocket_n.mask)[:, None, :], (b, n_phar_max, nd)
    )
    mu = jnp.concatenate(
        [mu_x, jnp.zeros((b, n_phar_max, model.phar_nf))], axis=-1
    ) * phar_mask[..., None]
    z_phar, xh_pocket = model._sample_normal_zero_com(
        k_init, mu, pocket_n.xh, jnp.ones(()), phar_mask, pocket_n.mask
    )

    def step(carry, st):
        z, xh_pkt, key = carry
        key, sub = jax.random.split(key)
        z, xh_pkt = model._denoise_step(
            params, sub, z, xh_pkt, st[0], st[1], phar_mask, pocket_n.mask,
        )
        return (z, xh_pkt, key), z[..., :nd]

    (z_phar, xh_pocket, _), frames = jax.lax.scan(
        step, (z_phar, xh_pocket, k_scan),
        respaced_st_pairs(cfg.timesteps, T),
    )
    stride = max(T // keep_frames, 1)
    frames = model.unnormalize_x(frames[::stride])
    # final denoise like sample_given_pocket
    gamma_0 = jnp.broadcast_to(model._gamma0(params), (b,))
    net_out, _ = model._apply(
        params, z_phar, xh_pocket, jnp.zeros((b, 1)), phar_mask, pocket_n.mask
    )
    a0, s0 = sch.alpha(gamma_0), sch.sigma(gamma_0)
    mu_final = (z_phar - _inflate(s0) * net_out) / _inflate(a0)
    xh_phar, xh_pocket = model._sample_normal_zero_com(
        k_final, mu_final, xh_pocket, sch.snr(-0.5 * gamma_0),
        phar_mask, pocket_n.mask,
    )
    x_phar = model.unnormalize_x(xh_phar[..., :nd])
    h_phar = jax.nn.one_hot(
        jnp.argmax(model.unnormalize_h(z_phar[..., nd:]), axis=-1),
        model.phar_nf,
    )
    phar_out = PointCloud(
        x=x_phar, h=h_phar * phar_mask[..., None], mask=phar_mask
    )
    pocket_out = PointCloud(
        x=model.unnormalize_x(xh_pocket[..., :nd]),
        h=model.unnormalize_h(xh_pocket[..., nd:]),
        mask=pocket_n.mask,
    )
    return phar_out, pocket_out, frames


def _gaussian_kl(mu_norm2, q_sigma, p_sigma, d):
    """KL between diagonal normals (en_diffusion.py:833-848)."""
    return (
        d * jnp.log(p_sigma / q_sigma)
        + 0.5 * (d * q_sigma**2 + mu_norm2) / p_sigma**2
        - 0.5 * d
    )
