"""Two-node-type denoiser wrapper around the EGNN.

Behavioral equivalent of EGNNDynamics
(DiffPhar/equivariant_diffusion/dynamics.py:9-147): pharmacophore and pocket
nodes are encoded into a shared feature space by per-type MLPs, concatenated
into one padded point set, conditioned on the diffusion time, run through the
EGNN over a distance-cutoff adjacency (self-edges included, like the
reference's ``mask[:,None]==mask[None,:]`` complete graph), and decoded back
per type. Velocity = coordinate displacement.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmdgen_tpu.models.egnn import EGNN, EGNNConfig, GNN
from cmdgen_tpu.ops.masked import pair_mask, remove_mean


@dataclasses.dataclass(frozen=True)
class DynamicsConfig:
    phar_nf: int = 8
    residue_nf: int = 20
    joint_nf: int = 32
    n_dims: int = 3
    condition_time: bool = True
    update_pocket_coords: bool = False  # False => conditional model
    edge_cutoff: Optional[float] = 6.0  # Å; None => complete graph
    # 'egnn_dynamics' | 'gnn_dynamics' (the reference's plain-GNN fallback,
    # dynamics.py:63-64,112-115: coordinates become node features and
    # velocities are read from the first 3 output channels — not
    # E(3)-equivariant, unused by shipped configs)
    mode: str = "egnn_dynamics"
    egnn: EGNNConfig = dataclasses.field(default_factory=EGNNConfig)


class TypeMLP(nn.Module):
    """Per-type 2-layer encoder/decoder (dynamics.py:21-43)."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        h = nn.Dense(self.mid, dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Dense(self.out, dtype=self.dtype)(h)


class EGNNDynamics(nn.Module):
    """eps-prediction network over (pharmacophore, pocket) padded clouds.

    __call__(xh_phar [B,Np,3+Fp], xh_pocket [B,Nq,3+Fq], t [B,1],
             mask_phar [B,Np], mask_pocket [B,Nq])
      -> (eps_phar [B,Np,3+Fp], eps_pocket [B,Nq,3+Fq])
    """

    cfg: DynamicsConfig

    @nn.compact
    def __call__(self, xh_phar, xh_pocket, t, mask_phar, mask_pocket):
        cfg = self.cfg
        nd = cfg.n_dims
        dt = cfg.egnn.compute_dtype
        x_phar, h_phar = xh_phar[..., :nd], xh_phar[..., nd:]
        x_pocket, h_pocket = xh_pocket[..., :nd], xh_pocket[..., nd:]

        h_phar = TypeMLP(2 * cfg.phar_nf, cfg.joint_nf, dt, name="phar_encoder")(h_phar)
        h_pocket = TypeMLP(
            2 * cfg.residue_nf, cfg.joint_nf, dt, name="residue_encoder"
        )(h_pocket)

        x = jnp.concatenate([x_phar, x_pocket], axis=-2)
        h = jnp.concatenate([h_phar, h_pocket], axis=-2)
        mask = jnp.concatenate([mask_phar, mask_pocket], axis=-1)

        if cfg.condition_time:
            h_time = jnp.broadcast_to(t[..., None, :], (*h.shape[:-1], 1))
            h = jnp.concatenate([h, h_time.astype(h.dtype)], axis=-1)

        # adjacency: valid×valid pairs, optionally distance-cutoff
        # (dynamics.py:141-147; the diagonal/self-edges stay in, as there)
        edge_mask = pair_mask(mask, mask)
        if cfg.edge_cutoff is not None:
            d2 = jnp.sum(
                (x[..., :, None, :] - x[..., None, :, :]) ** 2, axis=-1
            )
            edge_mask = edge_mask * (d2 <= cfg.edge_cutoff**2).astype(edge_mask.dtype)

        if cfg.mode == "gnn_dynamics":
            # plain-GNN fallback: [x ‖ h] in, [vel ‖ h] out; the reference
            # applies no update_coords_mask here (dynamics.py:112-115) — the
            # conditional DDPM never reads pocket eps anyway
            out = GNN(
                cfg.egnn,
                out_node_nf=cfg.n_dims + h.shape[-1],
                name="gnn",
            )(jnp.concatenate([x.astype(h.dtype), h], axis=-1), edge_mask, mask)
            vel = out[..., :nd] * mask[..., None]
            h_final = out[..., nd:]
        else:
            update_coords_mask = None
            update_rows = None
            if not cfg.update_pocket_coords:
                update_coords_mask = jnp.concatenate(
                    [mask_phar, jnp.zeros_like(mask_pocket)], axis=-1
                )
                # pharmacophore nodes come first in the concat: the coordinate
                # pass only ever moves those rows (statically known)
                update_rows = xh_phar.shape[-2]

            h_final, x_final = EGNN(
                cfg.egnn, out_node_nf=cfg.joint_nf + 1, name="egnn"
            )(h, x, edge_mask, mask, update_coords_mask, update_rows)
            vel = (x_final - x) * mask[..., None]

        if cfg.condition_time:
            h_final = h_final[..., :-1]

        n_phar = xh_phar.shape[-2]
        h_out_phar = TypeMLP(
            2 * cfg.phar_nf, cfg.phar_nf, dt, name="phar_decoder"
        )(h_final[..., :n_phar, :]).astype(jnp.float32)
        h_out_pocket = TypeMLP(
            2 * cfg.residue_nf, cfg.residue_nf, dt, name="residue_decoder"
        )(h_final[..., n_phar:, :]).astype(jnp.float32)

        # NaN guard (dynamics.py:129-131): zero velocities if anything blew up
        vel = jnp.where(jnp.isnan(vel), jnp.zeros_like(vel), vel)

        if cfg.update_pocket_coords:
            # joint model keeps outputs in the CoM-free subspace
            vel = remove_mean(vel, mask)

        eps_phar = jnp.concatenate([vel[..., :n_phar, :], h_out_phar], axis=-1)
        eps_pocket = jnp.concatenate([vel[..., n_phar:, :], h_out_pocket], axis=-1)
        return (
            eps_phar * mask_phar[..., None],
            eps_pocket * mask_pocket[..., None],
        )


def _dense(h, p):
    out = h @ p["kernel"]
    if "bias" in p:
        out = out + p["bias"]
    return out


def _type_mlp(h, p):
    h = jax.nn.silu(_dense(h, p["Dense_0"]))
    return _dense(h, p["Dense_1"])


def make_pallas_apply(cfg: DynamicsConfig, interpret: bool = False,
                      compute_dtype=None, engine: str = "fused",
                      samples_per_program: int = 1):
    """A drop-in replacement for EGNNDynamics.apply backed by the fused
    whole-network Pallas EGNN kernel (ops/egnn_fused.py). Same
    signature/params tree; inference path (no custom VJP — use the flax
    path for training). Requires neighbor_k (the dense mode's production
    path is the flax/XLA graph; the round-2 dense and block-sparse Pallas
    engines measured 4-17x slower than XLA and were removed — PERF.md)."""
    from cmdgen_tpu.ops.egnn_fused import egnn_forward_fused

    assert cfg.egnn.inv_sublayers == 1, "pallas path supports inv_sublayers=1"
    assert cfg.mode == "egnn_dynamics" and not cfg.egnn.sin_embedding, (
        "pallas path supports the flagship egnn mode without sin_embedding"
    )
    assert engine in ("fused", "auto"), f"unknown pallas engine: {engine}"
    assert cfg.egnn.neighbor_k is not None, "fused engine needs neighbor_k"
    assert cfg.egnn.aggregation_method == "sum", (
        "the fused kernel hard-codes sum aggregation (divide by "
        "normalization_factor); use the flax path for 'mean'"
    )

    def apply_fn(variables, xh_phar, xh_pocket, t, mask_phar, mask_pocket):
        p = variables["params"]
        nd = cfg.n_dims
        x_phar, h_phar = xh_phar[..., :nd], xh_phar[..., nd:]
        x_pocket, h_pocket = xh_pocket[..., :nd], xh_pocket[..., nd:]
        h_phar = _type_mlp(h_phar, p["phar_encoder"])
        h_pocket = _type_mlp(h_pocket, p["residue_encoder"])
        x = jnp.concatenate([x_phar, x_pocket], axis=-2)
        h = jnp.concatenate([h_phar, h_pocket], axis=-2)
        mask = jnp.concatenate([mask_phar, mask_pocket], axis=-1)
        if cfg.condition_time:
            h_time = jnp.broadcast_to(t[..., None, :], (*h.shape[:-1], 1))
            h = jnp.concatenate([h, h_time.astype(h.dtype)], axis=-1)
        edge_mask = pair_mask(mask, mask)
        if cfg.edge_cutoff is not None:
            d2 = jnp.sum(
                (x[..., :, None, :] - x[..., None, :, :]) ** 2, axis=-1
            )
            edge_mask = edge_mask * (
                d2 <= cfg.edge_cutoff**2
            ).astype(edge_mask.dtype)
        update_coords_mask = None
        if not cfg.update_pocket_coords:
            update_coords_mask = jnp.concatenate(
                [mask_phar, jnp.zeros_like(mask_pocket)], axis=-1
            )
        cdt = (compute_dtype if compute_dtype is not None
               else cfg.egnn.compute_dtype)
        h_final, x_final = egnn_forward_fused(
            p["egnn"], h, x, edge_mask, mask, update_coords_mask,
            n_layers=cfg.egnn.n_layers, out_node_nf=cfg.joint_nf + 1,
            neighbor_k=cfg.egnn.neighbor_k,
            norm_constant=cfg.egnn.norm_constant,
            coords_range=cfg.egnn.coords_range,
            normalization_factor=cfg.egnn.normalization_factor,
            tanh=cfg.egnn.tanh,
            update_rows=(None if cfg.update_pocket_coords
                         else xh_phar.shape[-2]),
            interpret=interpret, compute_dtype=cdt,
            samples_per_program=samples_per_program,
        )
        vel = (x_final - x) * mask[..., None]
        if cfg.condition_time:
            h_final = h_final[..., :-1]
        n_phar = xh_phar.shape[-2]
        h_out_phar = _type_mlp(h_final[..., :n_phar, :], p["phar_decoder"])
        h_out_pocket = _type_mlp(h_final[..., n_phar:, :], p["residue_decoder"])
        vel = jnp.where(jnp.isnan(vel), jnp.zeros_like(vel), vel)
        if cfg.update_pocket_coords:
            vel = remove_mean(vel, mask)
        eps_phar = jnp.concatenate(
            [vel[..., :n_phar, :], h_out_phar], axis=-1
        )
        eps_pocket = jnp.concatenate(
            [vel[..., n_phar:, :], h_out_pocket], axis=-1
        )
        return (
            eps_phar * mask_phar[..., None],
            eps_pocket * mask_pocket[..., None],
        )

    return apply_fn
