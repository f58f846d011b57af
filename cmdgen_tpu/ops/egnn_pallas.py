"""Fused EGNN pair-message kernels (Pallas/Mosaic, TPU).

The EGNN block's hot loop builds pair features, runs a 2-layer edge MLP with
an attention gate, and aggregates messages plus tanh-gated coordinate
updates (models/egnn.py, mirroring egnn_new.py:6-156). The plain XLA version
materializes several ``[B, N, N, H]`` tensors in HBM, making sampling
bandwidth-bound. These kernels keep the whole pair block in VMEM per
(sample, i-tile) grid cell: HBM traffic drops from O(B·N²·H) to O(B·N·H).

Two kernels per EquivariantBlock (they see different h):
  - message kernel: m_ij = att(silu(W2 silu(p_ij))), agg_i = Σ_j mask·m/nf
  - coord kernel:   g_ij = tanh(gate(silu(C2 silu(c_ij))))·range,
                    cagg_i = Σ_j mask·coord_diff·g/nf
with p_ij = wi[i] + wj[j] + radial_ij·we_r + dist0_ij·we_d precomputed as
cheap node-level projections outside the kernel.

The node-level MLPs (O(B·N·H²)) stay in XLA.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(mode: str, tile: int, n_pad: int, hdim: int,
                 compute_dtype=jnp.float32):
    """mode: 'msg' (attention-gated messages) or 'coord' (gated updates)."""

    def _silu(v):
        # explicit-dtype silu: Mosaic rejects f32 literals broadcast into
        # bf16 vectors, which jax.nn.silu can emit
        one = jnp.ones((), dtype=v.dtype)
        return v / (one + jnp.exp(-v))

    def kernel(
        x_ref,      # [1, N, 3]
        dist0_ref,  # [1, TI, N]
        emask_ref,  # [1, TI, N]
        wi_ref,     # [1, TI, H]
        wj_ref,     # [1, N, H]
        we_ref,     # [2, H]
        w2_ref,     # [H, H]
        b2_ref,     # [1, H]
        head_ref,   # [H, 1]  (att weight | gate weight)
        headb_ref,  # [1, 1]  (att bias | unused)
        scal_ref,   # [1, 4]  (norm_constant, coords_range, norm_factor, tanh)
        out_ref,    # [1, TI, H] | [1, TI, 3]
    ):
        it = pl.program_id(1)
        norm_constant = scal_ref[0, 0]
        coords_range = scal_ref[0, 1]
        norm_factor = scal_ref[0, 2]
        tanh_flag = scal_ref[0, 3]

        x_j = x_ref[0]                                  # [N, 3]
        x_i = x_ref[0, pl.ds(it * tile, tile), :]       # [TI, 3]
        diff = x_i[:, None, :] - x_j[None, :, :]        # [TI, N, 3]
        radial = jnp.sum(diff * diff, axis=-1)          # [TI, N]

        we_r = we_ref[0:1, :].reshape(1, 1, hdim).astype(compute_dtype)
        we_d = we_ref[1:2, :].reshape(1, 1, hdim).astype(compute_dtype)
        pre = (
            wi_ref[0][:, None, :].astype(compute_dtype)
            + wj_ref[0][None, :, :].astype(compute_dtype)
            + radial[..., None].astype(compute_dtype) * we_r
            + dist0_ref[0][..., None].astype(compute_dtype) * we_d
        )                                               # [TI, N, H]
        m = _silu(pre.astype(compute_dtype)).reshape(tile * n_pad, hdim)
        m = (
            jnp.dot(
                m,
                w2_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[0][None, :]
        )
        m = _silu(m.astype(compute_dtype))
        emask = emask_ref[0]                            # [TI, N]

        if mode == "msg":
            att = jax.nn.sigmoid(
                jnp.dot(
                    m,
                    head_ref[:].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + headb_ref[0, 0]
            )
            m = (
                m.astype(jnp.float32) * att
            ).reshape(tile, n_pad, hdim) * emask[..., None]
            out_ref[0] = (jnp.sum(m, axis=1) / norm_factor).astype(
                out_ref.dtype
            )
        else:
            g = jnp.dot(
                m,
                head_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            g = jnp.where(tanh_flag > 0, jnp.tanh(g) * coords_range, g)
            norm = jnp.sqrt(radial + 1e-8)
            coord_diff = diff / (norm + norm_constant)[..., None]
            trans = (
                coord_diff * g.reshape(tile, n_pad, 1) * emask[..., None]
            )
            out_ref[0] = (jnp.sum(trans, axis=1) / norm_factor).astype(
                out_ref.dtype
            )

    return kernel


def _pair_pass(
    mode: str,
    x: jnp.ndarray,       # [B, N, 3]
    dist0: jnp.ndarray,   # [B, N, N]
    emask: jnp.ndarray,   # [B, N, N]
    wi: jnp.ndarray,      # [B, N, H]
    wj: jnp.ndarray,      # [B, N, H]
    we: jnp.ndarray,      # [2, H]
    w2: jnp.ndarray,      # [H, H]
    b2: jnp.ndarray,      # [H]
    head: jnp.ndarray,    # [H, 1]
    headb: jnp.ndarray,   # scalar
    norm_constant: float,
    coords_range: float,
    norm_factor: float,
    tanh: bool,
    tile: int = 16,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    b, n, _ = x.shape
    hdim = wi.shape[-1]
    n_pad = _round_up(n, tile)
    if n_pad != n:
        def pad(a, axes):
            return jnp.pad(
                a,
                [(0, n_pad - n) if i in axes else (0, 0) for i in range(a.ndim)],
            )

        x = pad(x, (1,))
        dist0 = pad(dist0, (1, 2))
        emask = pad(emask, (1, 2))
        wi = pad(wi, (1,))
        wj = pad(wj, (1,))
    scal = jnp.asarray(
        [[norm_constant, coords_range, norm_factor, 1.0 if tanh else 0.0]],
        dtype=jnp.float32,
    )
    grid = (b, n_pad // tile)
    out_dim = hdim if mode == "msg" else 3
    kernel = _make_kernel(mode, tile, n_pad, hdim, compute_dtype)

    im_row = lambda bi, ti: (bi, 0, 0)
    im_tile = lambda bi, ti: (bi, ti, 0)
    im_w = lambda bi, ti: (0, 0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), im_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, n_pad), im_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, n_pad), im_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, hdim), im_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hdim), im_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hdim), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, hdim), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, 1), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), im_w, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), im_w, memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, out_dim), im_tile, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, out_dim), jnp.float32),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        dist0.astype(jnp.float32),
        emask.astype(jnp.float32),
        wi.astype(compute_dtype),
        wj.astype(compute_dtype),
        we.astype(compute_dtype),
        w2.astype(compute_dtype),
        b2.reshape(1, -1).astype(jnp.float32),
        head.astype(compute_dtype),
        jnp.reshape(headb, (1, 1)).astype(jnp.float32),
        scal,
    )
    return out[:, :n]


# ------------------------------------------------------------ full forward

def _dense(h, p):
    out = h @ p["kernel"]
    if "bias" in p:
        out = out + p["bias"]
    return out


def egnn_forward_pallas(
    egnn_params: dict,
    h: jnp.ndarray,          # [B, N, D_in]
    x: jnp.ndarray,          # [B, N, 3]
    edge_mask: jnp.ndarray,  # [B, N, N]
    node_mask: jnp.ndarray,  # [B, N]
    update_coords_mask: Optional[jnp.ndarray],
    n_layers: int,
    out_node_nf: int,
    norm_constant: float = 1.0,
    coords_range: float = 15.0,
    normalization_factor: float = 100.0,
    tanh: bool = True,
    tile: int = 16,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
):
    """Pallas-accelerated equivalent of models.egnn.EGNN.__call__ for
    inv_sublayers == 1 (the flagship configs). ``egnn_params`` is the flax
    param subtree of the EGNN module."""
    coords_range_layer = coords_range / n_layers
    diff0 = x[:, :, None, :] - x[:, None, :, :]
    dist0 = jnp.sum(diff0 * diff0, axis=-1)  # [B, N, N]

    h = _dense(h, egnn_params["embedding"])
    for i in range(n_layers):
        blk = egnn_params[f"e_block_{i}"]
        gcl = blk["gcl_0"]
        cu = blk["coord_update"]
        # node-level first-layer projections (cheap XLA matmuls)
        wi = h @ gcl["edge_in"]["w_i"]["kernel"]
        wj = _dense(h, gcl["edge_in"]["w_j"])
        we = gcl["edge_in"]["w_e"]["kernel"]  # [2, H]
        agg = _pair_pass(
            "msg", x, dist0, edge_mask, wi, wj, we,
            gcl["edge_out"]["kernel"], gcl["edge_out"]["bias"],
            gcl["att"]["kernel"], gcl["att"]["bias"],
            norm_constant, coords_range_layer, normalization_factor, tanh,
            tile=tile, interpret=interpret, compute_dtype=compute_dtype,
        )
        upd = jnp.concatenate([h, agg.astype(h.dtype)], axis=-1)
        upd = jax.nn.silu(_dense(upd, gcl["node_in"]))
        h = h + _dense(upd, gcl["node_out"])
        h = h * node_mask[..., None]

        cwi = h @ cu["coord_in"]["w_i"]["kernel"]
        cwj = _dense(h, cu["coord_in"]["w_j"])
        cwe = cu["coord_in"]["w_e"]["kernel"]
        cagg = _pair_pass(
            "coord", x, dist0, edge_mask, cwi, cwj, cwe,
            cu["coord_mid"]["kernel"], cu["coord_mid"]["bias"],
            cu["coord_gate"]["kernel"], jnp.zeros(()),
            norm_constant, coords_range_layer, normalization_factor, tanh,
            tile=tile, interpret=interpret, compute_dtype=compute_dtype,
        )
        if update_coords_mask is not None:
            cagg = cagg * update_coords_mask[..., None]
        x = (x + cagg.astype(x.dtype)) * node_mask[..., None]

    h = _dense(h, egnn_params["embedding_out"])
    h = h * node_mask[..., None]
    return h.astype(jnp.float32), x.astype(jnp.float32)
