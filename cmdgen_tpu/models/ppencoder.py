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


class PPEncoder(nn.Module):
    """EGATEncoderBlock equivalent: n_layers attention layers with node
    LayerNorm + dropout, one extra final layer, residual to the input."""

    dim: int
    n_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, e, node_mask, deterministic=True):
        init = h
        for i in range(self.n_layers):
            h, e = EGATLayer(self.dim, self.num_heads, name=f"egat_{i}")(
                h, e, node_mask
            )
            if self.dropout > 0 and not deterministic:
                h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
            h = nn.LayerNorm(name=f"ln_{i}")(h)
        h, _ = EGATLayer(self.dim, self.num_heads, name="egat_final")(
            h, e, node_mask
        )
        h = h + init
        return h * node_mask[..., None]
