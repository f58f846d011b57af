"""Whole-network fused EGNN Pallas kernel (fixed-K neighbor list).

Round-3 kernel design, built from the round-2 lessons recorded in PERF.md:

- Round 2's per-pass kernels (removed in round 3 — see PERF.md) launched
  one program per (batch element x pass x layer) — 480 programs/step at
  flagship shapes, paying ~10 us each of launch + serial VPU<->MXU
  overhead, and writing every intermediate back to HBM between passes.
  They lost to XLA (6.5-31.7 ms vs 1.8 ms/batch-step).
- This kernel runs the ENTIRE n_layers EGNN stack for one sample in ONE
  program (grid = batch): h and x never leave VMEM between blocks, every
  layer's weights are resident, and per-step program count drops from 480
  to B.
- All pair math is laid out "stacked-K": the K neighbor gathers become one
  [K*N, N] 0/1 matrix (built once per sample from a lane-iota comparison,
  reused by every layer) applied as a single MXU matmul per tensor, and
  the pair MLPs run on [K*N, H] blocks — large, aligned matmuls instead of
  round 2's 12 skinny ones. The per-receiver K-sum is K sublane-slice adds
  (VPU), replacing round 2's transpose matmul.
- The coordinate pass is statically sliced to the movable receivers
  (`update_rows`, rounded up to a sublane tile), mirroring the exact
  row-slicing optimization of the flax path (models/egnn.py).

Semantics are models.egnn.EGNN with inv_sublayers=1 and neighbor_k set
(exact vs the dense path whenever K bounds the in-cutoff neighbor count).
Inference path — training uses the flax graph.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _silu(v):
    one = jnp.ones((), dtype=v.dtype)
    return v / (one + jnp.exp(-v))


def _make_fused_kernel(n: int, k: int, hdim: int, n_layers: int,
                       r_pad: int, r_true: int,
                       norm_constant: float, coords_range: float,
                       norm_factor: float, tanh: bool,
                       compute_dtype=jnp.bfloat16,
                       samples_per_program: int = 1):
    """Kernel body builder. Shapes/constants are closure-static.

    ``samples_per_program`` (SB) runs SB batch elements sequentially inside
    one program (grid = B/SB): per-program launch + weight-streaming
    overhead (~10 us measured round 2) is amortized SB-fold while VMEM
    working-set stays per-sample (the unrolled loop's buffers are reused
    across iterations by liveness analysis)."""
    kn = k * n
    kr = k * r_pad
    cdt = compute_dtype

    def kernel(
        h_ref,      # [SB, N, H]  embedded node features (cdt)
        x_ref,      # [SB, N, 3]  coordinates f32
        col_ref,    # [SB, KN, 1] stacked neighbor indices int32
        kms_ref,    # [SB, KN, 1] stacked neighbor validity f32
        d0s_ref,    # [SB, KN, 1] stacked entry squared distances f32
        colr_ref,   # [SB, KR, 1] stacked indices, movable rows, int32
        kmr_ref,    # [SB, KR, 1]
        d0r_ref,    # [SB, KR, 1]
        nm_ref,     # [SB, N, 1]  node mask f32
        wi_ref,     # [L, H, H]   edge w_i (cdt)
        wj_ref,     # [L, H, H]   edge w_j
        wjb_ref,    # [L, 1, H]   edge w_j bias (f32)
        we_ref,     # [L, 2, H]   edge w_e rows (radial, dist0)
        w2_ref,     # [L, H, H]   edge_out
        w2b_ref,    # [L, 1, H]
        att_ref,    # [L, H, 1]
        attb_ref,   # [L, 1, 1]
        nih_ref,    # [L, H, H]   node_in (h half)
        nia_ref,    # [L, H, H]   node_in (agg half)
        nib_ref,    # [L, 1, H]
        no_ref,     # [L, H, H]   node_out
        nob_ref,    # [L, 1, H]
        cwi_ref,    # [L, H, H]   coord w_i
        cwj_ref,    # [L, H, H]   coord w_j
        cwjb_ref,   # [L, 1, H]
        cwe_ref,    # [L, 2, H]
        cm_ref,     # [L, H, H]   coord_mid
        cmb_ref,    # [L, 1, H]
        cg_ref,     # [L, H, 1]   coord_gate (no bias)
        hout_ref,   # [SB, N, H]  f32
        xout_ref,   # [SB, N, 3]  f32
    ):
      for s in range(samples_per_program):
        nmask = nm_ref[s]                       # [N, 1] f32
        h = h_ref[s].astype(cdt)                # [N, H]
        x = x_ref[s]                            # [N, 3] f32

        # --- stacked-K gather machinery, built once, reused per layer.
        # The stacked [KN, 1] column vectors (col[kk*n+i] = idx[i, kk]) are
        # precomputed OUTSIDE the kernel: building them in-kernel from
        # per-column slices hands tpu.concatenate inputs with k distinct
        # lane offsets, which Mosaic rejects ("offset mismatch on
        # non-concat dimension").
        lane = jax.lax.broadcasted_iota(jnp.int32, (kn, n), 1)
        col = col_ref[s]                         # [KN, 1]
        oh = (lane == col).astype(cdt)           # [KN, N] 0/1 gather matrix
        km_s = kms_ref[s]                        # [KN, 1]
        d0_s = d0s_ref[s].astype(cdt)            # [KN, 1]

        # movable-receiver (first r_pad rows of each k-block) variants
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (kr, n), 1)
        col_r = colr_ref[s]
        oh_r = (lane_r == col_r).astype(cdt)     # [KR, N]
        oh_r32 = oh_r.astype(jnp.float32)
        km_r = kmr_ref[s]
        d0_r = d0r_ref[s].astype(cdt)
        # rows >= the true movable count never move (r_pad is tile-rounded)
        row_r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 1), 0)
        move_mask = (row_r < r_true).astype(jnp.float32)

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        for l in range(n_layers):
            # ---------------- invariant message pass (GCL)
            wi = mm(h, wi_ref[l].astype(cdt)).astype(cdt)          # [N, H]
            wj = (mm(h, wj_ref[l].astype(cdt)) + wjb_ref[l]).astype(cdt)
            # the GCL only consumes radial, and radial is cast to cdt
            # below — gather x in cdt (bf16 on TPU: ~4-8x the f32 MXU
            # rate; exact in the f32 interpret path where cdt == f32).
            # The coordinate pass keeps its f32 gather (xj_r): its diffs
            # accumulate into x across layers and scan steps.
            xj = mm(oh, x.astype(cdt))                             # [KN, 3]
            xi = jnp.concatenate([x.astype(cdt)] * k, axis=0)      # [KN, 3]
            diff = xi - xj
            radial = jnp.sum(diff * diff, axis=-1, keepdims=True)  # [KN, 1]
            wj_g = mm(oh, wj).astype(cdt)                          # [KN, H]
            wi_e = jnp.concatenate([wi] * k, axis=0)               # [KN, H]
            pre = (
                wi_e + wj_g
                + radial.astype(cdt) * we_ref[l, 0:1, :].astype(cdt)
                + d0_s * we_ref[l, 1:2, :].astype(cdt)
            )
            m = _silu(pre)
            m = _silu((mm(m, w2_ref[l].astype(cdt)) + w2b_ref[l]).astype(cdt))
            att = jax.nn.sigmoid(
                mm(m, att_ref[l].astype(cdt)) + attb_ref[l]
            )                                                      # [KN, 1]
            # message weighting + K-sum in compute dtype: the [KN, H]
            # elementwise chain is the kernel's largest VPU load; bf16 is
            # well inside the TPU tolerance (the f32 interpret path is
            # unchanged since cdt is f32 there)
            scale = (att * km_s).astype(cdt)                       # [KN, 1]
            mmsg = m * scale                                       # [KN, H]
            agg = mmsg[0:n]
            for kk in range(1, k):
                agg = agg + mmsg[kk * n:(kk + 1) * n]
            agg = agg * jnp.asarray(1.0 / norm_factor, cdt)        # [N, H]

            # ---------------- node MLP (residual)
            upd = _silu(
                (mm(h, nih_ref[l].astype(cdt))
                 + mm(agg, nia_ref[l].astype(cdt))
                 + nib_ref[l]).astype(cdt)
            )
            h = (h + (mm(upd, no_ref[l].astype(cdt)) + nob_ref[l]).astype(cdt))
            h = h * nmask.astype(cdt)

            # ---------------- coordinate pass (movable receivers only)
            cwi = mm(h[0:r_pad], cwi_ref[l].astype(cdt)).astype(cdt)
            cwj = (mm(h, cwj_ref[l].astype(cdt)) + cwjb_ref[l]).astype(cdt)
            xj_r = mm(oh_r32, x)                                   # [KR, 3]
            xi_r = jnp.concatenate([x[0:r_pad]] * k, axis=0)
            diff_r = xi_r - xj_r
            radial_r = jnp.sum(diff_r * diff_r, axis=-1, keepdims=True)
            cwj_g = mm(oh_r, cwj).astype(cdt)                      # [KR, H]
            cwi_e = jnp.concatenate([cwi] * k, axis=0)
            pre_c = (
                cwi_e + cwj_g
                + radial_r.astype(cdt) * cwe_ref[l, 0:1, :].astype(cdt)
                + d0_r * cwe_ref[l, 1:2, :].astype(cdt)
            )
            o = _silu(pre_c)
            o = _silu((mm(o, cm_ref[l].astype(cdt)) + cmb_ref[l]).astype(cdt))
            g = mm(o, cg_ref[l].astype(cdt))                       # [KR, 1]
            if tanh:
                g = jnp.tanh(g) * coords_range
            norm = jnp.sqrt(radial_r + 1e-8)
            cd = diff_r / (norm + norm_constant)
            trans = cd * g * km_r                                  # [KR, 3]
            cagg = trans[0:r_pad]
            for kk in range(1, k):
                cagg = cagg + trans[kk * r_pad:(kk + 1) * r_pad]
            cagg = (cagg / norm_factor) * move_mask                # [r_pad, 3]
            x = jnp.concatenate([x[0:r_pad] + cagg, x[r_pad:]], axis=0)
            x = x * nmask

        hout_ref[s] = h.astype(jnp.float32)
        xout_ref[s] = x.astype(jnp.float32)

    return kernel


def egnn_forward_fused(
    egnn_params: dict,
    h: jnp.ndarray,            # [B, N, D_in]
    x: jnp.ndarray,            # [B, N, 3]
    edge_mask: jnp.ndarray,    # [B, N, N]
    node_mask: jnp.ndarray,    # [B, N]
    update_coords_mask: Optional[jnp.ndarray],
    n_layers: int,
    out_node_nf: int,
    neighbor_k: int,
    norm_constant: float = 1.0,
    coords_range: float = 15.0,
    normalization_factor: float = 100.0,
    tanh: bool = True,
    update_rows: Optional[int] = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    samples_per_program: int = 1,
):
    """models.egnn.EGNN equivalent (inv_sublayers=1, neighbor-list mode)
    as ONE fused pallas_call over the whole stack. ``update_rows``: the
    movable receivers are the first ``update_rows`` rows (the conditional
    model's pharmacophore nodes); None moves every row.
    ``samples_per_program``: batch elements run per Pallas program (the
    batch is zero-padded up to a multiple; padded rows have node_mask 0).
    A stacked-samples variant (SB samples flattened into every matmul's M
    dimension) was A/B'd on hardware in round 4 and tied the per-sample
    loop exactly (2.60 ms/step vs XLA's 1.82 at B=48, K=12, SB=8) — both
    fused variants lose to XLA's overlapped fusion, so the simpler
    per-sample kernel is the one kept (PERF.md round-4 note)."""
    b, n, _ = h.shape
    kk = min(neighbor_k, n)
    hdim = egnn_params["embedding"]["kernel"].shape[1]

    # ---- neighbor list from entry coordinates (XLA; cheap). The gathered
    # kmask/dist0 use one-hot einsums, NOT take_along_axis — integer
    # gathers lower to scalar loops on XLA:TPU (models/egnn.py lesson)
    d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
    score = jnp.where(edge_mask > 0, -d2, -jnp.inf)
    # exact top-k via the TPU PartialReduce path (see models/egnn.py)
    _, idx = jax.lax.approx_max_k(score, kk, recall_target=1.0)
    onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    kmask = jnp.einsum("bikn,bin->bik", onehot, edge_mask.astype(jnp.float32))
    dist0k = jnp.einsum("bikn,bin->bik", onehot, d2)

    # ---- embedding (XLA)
    emb = egnn_params["embedding"]
    h0 = (h @ emb["kernel"] + emb["bias"]).astype(compute_dtype)

    # ---- pad N to a clean tile
    n_pad = _round_up(n, 16)
    if n_pad != n:
        pad_n = [(0, 0), (0, n_pad - n), (0, 0)]
        h0 = jnp.pad(h0, pad_n)
        x_p = jnp.pad(x, pad_n)
        idx = jnp.pad(idx, pad_n)
        kmask = jnp.pad(kmask, pad_n)
        dist0k = jnp.pad(dist0k, pad_n)
        nm = jnp.pad(node_mask, [(0, 0), (0, n_pad - n)])
    else:
        x_p, nm = x, node_mask

    r_true = update_rows if update_rows is not None else n_pad
    r_pad = min(_round_up(max(r_true, 1), 16), n_pad)

    # stacked-K [B, K*rows, 1] column vectors (see kernel docstring): a
    # transpose+reshape in XLA so every kernel input enters at lane offset 0
    def stack_cols(v, rows):
        return jnp.transpose(v[:, :rows], (0, 2, 1)).reshape(b, kk * rows, 1)

    idx_i32 = idx.astype(jnp.int32)
    km_f32 = kmask.astype(jnp.float32)
    d0_f32 = dist0k.astype(jnp.float32)
    col_s = stack_cols(idx_i32, n_pad)
    kms_s = stack_cols(km_f32, n_pad)
    d0s_s = stack_cols(d0_f32, n_pad)
    col_r = stack_cols(idx_i32, r_pad)
    kmr_s = stack_cols(km_f32, r_pad)
    d0r_s = stack_cols(d0_f32, r_pad)

    # ---- stack per-layer weights (hoisted out of sampling scans by XLA)
    def stack(path):
        return jnp.stack([
            functools.reduce(
                lambda d, kname: d[kname],
                path, egnn_params[f"e_block_{i}"],
            )
            for i in range(n_layers)
        ])

    cdt = compute_dtype
    wi = stack(["gcl_0", "edge_in", "w_i", "kernel"]).astype(cdt)
    wj = stack(["gcl_0", "edge_in", "w_j", "kernel"]).astype(cdt)
    wjb = stack(["gcl_0", "edge_in", "w_j", "bias"])[:, None, :]
    we = stack(["gcl_0", "edge_in", "w_e", "kernel"]).astype(cdt)
    w2 = stack(["gcl_0", "edge_out", "kernel"]).astype(cdt)
    w2b = stack(["gcl_0", "edge_out", "bias"])[:, None, :]
    attk = stack(["gcl_0", "att", "kernel"]).astype(cdt)
    attb = stack(["gcl_0", "att", "bias"])[:, None, :]
    ni = stack(["gcl_0", "node_in", "kernel"])
    nih = ni[:, :hdim, :].astype(cdt)
    nia = ni[:, hdim:, :].astype(cdt)
    nib = stack(["gcl_0", "node_in", "bias"])[:, None, :]
    no = stack(["gcl_0", "node_out", "kernel"]).astype(cdt)
    nob = stack(["gcl_0", "node_out", "bias"])[:, None, :]
    cwi = stack(["coord_update", "coord_in", "w_i", "kernel"]).astype(cdt)
    cwj = stack(["coord_update", "coord_in", "w_j", "kernel"]).astype(cdt)
    cwjb = stack(["coord_update", "coord_in", "w_j", "bias"])[:, None, :]
    cwe = stack(["coord_update", "coord_in", "w_e", "kernel"]).astype(cdt)
    cm = stack(["coord_update", "coord_mid", "kernel"]).astype(cdt)
    cmb = stack(["coord_update", "coord_mid", "bias"])[:, None, :]
    cg = stack(["coord_update", "coord_gate", "kernel"]).astype(cdt)

    sb = max(1, min(samples_per_program, b))
    b_pad = _round_up(b, sb)
    if b_pad != b:
        def pad_b(v):
            return jnp.pad(v, [(0, b_pad - b)] + [(0, 0)] * (v.ndim - 1))
        h0, x_p, nm = pad_b(h0), pad_b(x_p), pad_b(nm)
        col_s, kms_s, d0s_s = pad_b(col_s), pad_b(kms_s), pad_b(d0s_s)
        col_r, kmr_s, d0r_s = pad_b(col_r), pad_b(kmr_s), pad_b(d0r_s)

    kernel = _make_fused_kernel(
        n_pad, kk, hdim, n_layers, r_pad, r_true,
        norm_constant, coords_range, normalization_factor, tanh,
        compute_dtype, samples_per_program=sb,
    )

    im_b = lambda bi: (bi, 0, 0)
    im_w = lambda bi: (0, 0, 0)
    L = n_layers
    vspec = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    hout, xout = pl.pallas_call(
        kernel,
        grid=(b_pad // sb,),
        in_specs=[
            vspec((sb, n_pad, hdim), im_b),
            vspec((sb, n_pad, 3), im_b),
            vspec((sb, kk * n_pad, 1), im_b),
            vspec((sb, kk * n_pad, 1), im_b),
            vspec((sb, kk * n_pad, 1), im_b),
            vspec((sb, kk * r_pad, 1), im_b),
            vspec((sb, kk * r_pad, 1), im_b),
            vspec((sb, kk * r_pad, 1), im_b),
            vspec((sb, n_pad, 1), im_b),
            vspec((L, hdim, hdim), im_w),   # wi
            vspec((L, hdim, hdim), im_w),   # wj
            vspec((L, 1, hdim), im_w),      # wjb
            vspec((L, 2, hdim), im_w),      # we
            vspec((L, hdim, hdim), im_w),   # w2
            vspec((L, 1, hdim), im_w),      # w2b
            vspec((L, hdim, 1), im_w),      # att
            vspec((L, 1, 1), im_w),         # attb
            vspec((L, hdim, hdim), im_w),   # nih
            vspec((L, hdim, hdim), im_w),   # nia
            vspec((L, 1, hdim), im_w),      # nib
            vspec((L, hdim, hdim), im_w),   # no
            vspec((L, 1, hdim), im_w),      # nob
            vspec((L, hdim, hdim), im_w),   # cwi
            vspec((L, hdim, hdim), im_w),   # cwj
            vspec((L, 1, hdim), im_w),      # cwjb
            vspec((L, 2, hdim), im_w),      # cwe
            vspec((L, hdim, hdim), im_w),   # cm
            vspec((L, 1, hdim), im_w),      # cmb
            vspec((L, hdim, 1), im_w),      # cg
        ],
        out_specs=(
            vspec((sb, n_pad, hdim), im_b),
            vspec((sb, n_pad, 3), im_b),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_pad, hdim), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n_pad, 3), jnp.float32),
        ),
        # the default 16 MiB scoped-VMEM ceiling caps samples_per_program
        # at ~2 (weights ~6 MiB + per-sample activations ~3 MiB); v5e has
        # 128 MiB VMEM/core — raise the ceiling so larger SB can amortize
        # program launch + weight streaming (measured ~10 us/program)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        h0, x_p.astype(jnp.float32),
        col_s, kms_s, d0s_s, col_r, kmr_s, d0r_s,
        nm[..., None].astype(jnp.float32),
        wi, wj, wjb, we, w2, w2b, attk, attb,
        nih, nia, nib, no, nob,
        cwi, cwj, cwjb, cwe, cm, cmb, cg,
    )
    hout = hout[:b, :n]
    xout = xout[:b, :n]

    # the kernel's row-sliced coordinate pass already froze rows >= r_true;
    # update_coords_mask additionally zeroes padded movable rows (their
    # kmask-covered aggregates are zero anyway — kept for exactness)
    if update_coords_mask is not None:
        xout = x + (xout - x) * update_coords_mask[..., None]

    out_emb = egnn_params["embedding_out"]
    hfin = hout @ out_emb["kernel"] + out_emb["bias"]
    hfin = hfin * node_mask[..., None]
    return hfin.astype(jnp.float32), xout.astype(jnp.float32)
