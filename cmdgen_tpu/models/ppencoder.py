"""Pharmacophore-graph encoder: edge-featured graph attention, dense form.

Behavioral equivalent of the reference's DGL EGATConv stack
(GCPG/model/egat_layers.py:7-46). Pharmacophore graphs have at most 8 fully
connected nodes (MAX_NUM_PP_GRAPHS, GCPG/utils/smiles2ppgraph.py:11), so a
graph library is pure overhead on TPU: the whole batch is a dense
``[B, 8, D]`` node tensor with ``[B, 8, 8, E]`` edge features and a masked
attention update — one fused einsum chain per layer.

Deliberate deviations from the reference, documented:
- LayerNorm instead of BatchNorm1d (batch-size independent, no cross-device
  stats; egat_layers.py:37 uses BatchNorm).
- the reference applies its *last* layer twice due to a loop quirk
  (egat_layers.py:41 reuses self.layers[-1]); here every layer is distinct
  and the stack ends with one extra attention layer, preserving depth.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmdgen_tpu.models.transformer import NEG_INF


class EGATLayer(nn.Module):
    """One edge-featured graph attention layer (DGL EGATConv semantics).

    f_ij = LeakyReLU(A [h_i ‖ e_ij ‖ h_j])    (per head)
    a_ij = softmax_j(att · f_ij)
    h'_i = mean_heads( Σ_j a_ij · (W h_j) )
    e'_ij = mean_heads(f_ij)
    """

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, h, e, node_mask):
        b, n, _ = h.shape
        hd = self.dim // self.num_heads if self.dim % self.num_heads == 0 else self.dim
        # per-head pair features without materializing the concat
        fi = nn.Dense(self.num_heads * hd, use_bias=False, name="f_i")(h)
        fj = nn.Dense(self.num_heads * hd, use_bias=True, name="f_j")(h)
        fe = nn.Dense(self.num_heads * hd, use_bias=False, name="f_e")(e)
        f = (
            fi[:, :, None, :] + fj[:, None, :, :] + fe
        ).reshape(b, n, n, self.num_heads, hd)
        f = nn.leaky_relu(f, negative_slope=0.2)
        logits = nn.Dense(1, use_bias=False, name="att")(f)[..., 0]  # [B,N,N,Hh]
        emask = (node_mask[:, :, None] * node_mask[:, None, :])[..., None]
        logits = jnp.where(emask > 0, logits, NEG_INF)
        alpha = jax.nn.softmax(logits, axis=2)
        alpha = alpha * emask  # rows with no valid neighbors -> all-zero
        v = nn.Dense(self.num_heads * hd, name="w_v")(h).reshape(
            b, n, self.num_heads, hd
        )
        h_out = jnp.einsum("bijh,bjhd->bihd", alpha, v)
        h_out = jnp.mean(h_out, axis=2)  # head mean (egat_layers.py:33)
        h_out = nn.Dense(self.dim, name="proj")(h_out)
        e_out = nn.Dense(self.dim, name="eproj")(jnp.mean(f, axis=3))
        return h_out, e_out


class GatedGCNLayer(nn.Module):
    """Dense GatedGCN (benchmarking-gnns style) — equivalent of the
    reference's alternative GGCNEncoderBlock (GCPG/model/ggcn_layers.py:
    14-123, imported but not active in the shipped model)."""

    dim: int

    @nn.compact
    def __call__(self, h, e, node_mask):
        emask = node_mask[:, :, None] * node_mask[:, None, :]
        # edge gate e'_ij = A e_ij + B h_i + C h_j
        e_new = (
            nn.Dense(self.dim, name="A")(e)
            + nn.Dense(self.dim, name="B")(h)[:, :, None, :]
            + nn.Dense(self.dim, name="C")(h)[:, None, :, :]
        )
        eta = jax.nn.sigmoid(e_new) * emask[..., None]
        denom = jnp.sum(eta, axis=2) + 1e-6
        msg = jnp.einsum(
            "bijd,bjd->bid", eta, nn.Dense(self.dim, name="V")(h)
        )
        h_new = nn.Dense(self.dim, name="U")(h) + msg / denom
        h = h + nn.relu(nn.LayerNorm()(h_new))
        e = e + nn.relu(nn.LayerNorm()(e_new))
        return h * node_mask[..., None], e * emask[..., None]


class GINELayer(nn.Module):
    """Dense GINE conv — equivalent of the reference's alternative
    GINEEncoderBlock (GCPG/model/gine_layers.py:7-45, unused alternate)."""

    dim: int

    @nn.compact
    def __call__(self, h, e, node_mask):
        emask = node_mask[:, :, None] * node_mask[:, None, :]
        msg = nn.relu(h[:, None, :, :] + e) * emask[..., None]
        agg = jnp.sum(msg, axis=2)
        eps = self.param("eps", nn.initializers.zeros, ())
        out = (1.0 + eps) * h + agg
        out = nn.Dense(self.dim)(out)
        out = nn.relu(out)
        out = nn.Dense(self.dim)(out)
        return out * node_mask[..., None]


class GraphTransformerLayer(nn.Module):
    """Dense graph transformer with edge-modulated attention — equivalent of
    the reference's DGLGraphTransformerBlock (GCPG/model/
    graphtransformer_layers.py:22-461, unused alternate)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, h, e, node_mask):
        hd = self.dim // self.num_heads
        b, n, _ = h.shape
        q = nn.Dense(self.dim, name="q")(h).reshape(b, n, self.num_heads, hd)
        k = nn.Dense(self.dim, name="k")(h).reshape(b, n, self.num_heads, hd)
        v = nn.Dense(self.dim, name="v")(h).reshape(b, n, self.num_heads, hd)
        eb = nn.Dense(self.num_heads, name="edge_bias")(e)  # [B,N,N,Hh]
        logits = jnp.einsum("bihd,bjhd->bijh", q, k) / (hd**0.5) + eb
        emask = (node_mask[:, :, None] * node_mask[:, None, :])[..., None]
        logits = jnp.where(emask > 0, logits, NEG_INF)
        att = jax.nn.softmax(logits, axis=2) * emask
        out = jnp.einsum("bijh,bjhd->bihd", att, v).reshape(b, n, self.dim)
        h = nn.LayerNorm()(h + nn.Dense(self.dim, name="o")(out))
        ff = nn.Dense(self.dim)(nn.relu(nn.Dense(2 * self.dim)(h)))
        h = nn.LayerNorm()(h + ff)
        return h * node_mask[..., None]


class PPEncoder(nn.Module):
    """EGATEncoderBlock equivalent: n_layers attention layers with node
    LayerNorm + dropout, one extra final layer, residual to the input.

    ``variant`` selects the conv type: 'egat' (the active reference
    encoder), or the reference's shipped-but-unused alternates 'ggcn',
    'gine', 'graphtransformer'.
    """

    dim: int
    n_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.0
    variant: str = "egat"

    @nn.compact
    def __call__(self, h, e, node_mask, deterministic=True):
        init = h
        for i in range(self.n_layers):
            if self.variant == "egat":
                h, e = EGATLayer(self.dim, self.num_heads, name=f"egat_{i}")(
                    h, e, node_mask
                )
            elif self.variant == "ggcn":
                h, e = GatedGCNLayer(self.dim, name=f"ggcn_{i}")(
                    h, e, node_mask
                )
            elif self.variant == "gine":
                h = GINELayer(self.dim, name=f"gine_{i}")(h, e, node_mask)
            elif self.variant == "graphtransformer":
                h = GraphTransformerLayer(
                    self.dim, self.num_heads, name=f"gt_{i}"
                )(h, e, node_mask)
            else:
                raise ValueError(self.variant)
            if self.dropout > 0 and not deterministic:
                h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
            h = nn.LayerNorm(name=f"ln_{i}")(h)
        if self.variant == "egat":
            h, _ = EGATLayer(self.dim, self.num_heads, name="egat_final")(
                h, e, node_mask
            )
        h = h + init
        return h * node_mask[..., None]
