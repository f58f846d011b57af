"""Per-GCL message-pass Pallas kernel (fixed-K neighbor list).

Round-4 kernel design, the third point in the Pallas design space after
the round-2 per-pass engines (removed) and the round-3 whole-network
fused kernel (kept, loses 1.4x — PERF.md):

- The whole-network kernel runs ~300 serial Mosaic instructions per
  sample — the VPU-heavy coordinate pass and node MLPs serialize against
  the MXU where XLA overlaps them. This kernel fuses ONLY the GCL
  message pass + aggregation (the HBM-dominant chain): two large MXU
  matmuls (one-hot gather, edge_out) with a light SiLU/attention VPU
  epilogue, leaving the node MLP and coordinate pass to XLA's overlapped
  fusion.
- What it saves on the XLA path (per GCL, flagship B=48 N=118 K=12
  H=256 bf16): the [B,N,K,N] one-hot read (16 MB — rebuilt in-VMEM from
  int32 indices via a lane-iota compare) and three [B,N,K,H] HBM
  round-trips (gather output, silu(pre) input to edge_out, mij) —
  ~139 of the ~155 MB/GCL the step-anatomy analysis attributes to the
  message pass. In exchange it pays Mosaic's serial VPU<->MXU schedule
  inside the kernel; the hardware A/B decides (benchmarks/egnn_probe.py
  mode ``mp``).
- Grid is (B,): ONE pallas_call per GCL, per-sample grid steps pipeline
  their HBM transfers behind compute; weights stay resident across grid
  steps (constant index_map).

Semantics: exactly ``models.egnn.GCL``'s message pass + ``_aggregate``
(sum aggregation) for the neighbor-list engine — parity-tested in
tests/test_egnn_msgpass.py (interpret f32 exact; TPU bf16 tolerance).
Inference path — training uses the flax graph (reference behavior:
egnn_new.py:6-66 message/aggregate algebra).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _silu(v):
    one = jnp.ones((), dtype=v.dtype)
    return v / (one + jnp.exp(-v))


def _make_kernel(n: int, k: int, hdim: int, attention: bool,
                 norm_factor: float, compute_dtype):
    kn = k * n
    cdt = compute_dtype

    def kernel(
        wi_ref,    # [1, N, H]  receiver projection (cdt)
        wj_ref,    # [1, N, H]  source projection + bias (cdt)
        col_ref,   # [1, KN, 1] stacked neighbor indices int32
        kms_ref,   # [1, KN, 1] stacked neighbor validity f32
        rad_ref,   # [1, KN, 1] stacked radial (current-x sq. distance) f32
        d0_ref,    # [1, KN, 1] stacked entry sq. distance f32
        we_ref,    # [2, H]     edge-feature rows (radial, dist0) (cdt)
        w2_ref,    # [H, H]     edge_out kernel (cdt)
        w2b_ref,   # [1, H]     edge_out bias f32
        atk_ref,   # [H, 1]     att kernel (cdt)   (zeros when !attention)
        atb_ref,   # [1, 1]     att bias f32
        out_ref,   # [1, N, H]  aggregated messages (cdt)
    ):
        # one-hot gather matrix rebuilt in VMEM from the int32 indices
        # (the stacked [KN,1] column layout and lane-iota compare are the
        # whole-network kernel's idiom — ops/egnn_fused.py)
        lane = jax.lax.broadcasted_iota(jnp.int32, (kn, n), 1)
        oh = (lane == col_ref[0]).astype(cdt)            # [KN, N]

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        wj_g = mm(oh, wj_ref[0].astype(cdt)).astype(cdt)  # [KN, H]
        wi = wi_ref[0].astype(cdt)                        # [N, H]
        wi_e = jnp.concatenate([wi] * k, axis=0)          # [KN, H]
        pre = (
            wi_e + wj_g
            + rad_ref[0].astype(cdt) * we_ref[0:1, :].astype(cdt)
            + d0_ref[0].astype(cdt) * we_ref[1:2, :].astype(cdt)
        )
        m = _silu(pre)
        m = _silu((mm(m, w2_ref[...].astype(cdt)) + w2b_ref[...]).astype(cdt))
        if attention:
            att = jax.nn.sigmoid(
                mm(m, atk_ref[...].astype(cdt)) + atb_ref[...]
            )                                             # [KN, 1]
            scale = (att * kms_ref[0]).astype(cdt)
        else:
            scale = kms_ref[0].astype(cdt)
        mmsg = m * scale                                  # [KN, H]
        agg = mmsg[0:n]
        for kk in range(1, k):
            agg = agg + mmsg[kk * n:(kk + 1) * n]
        out_ref[0] = (agg * jnp.asarray(1.0 / norm_factor, cdt)).astype(cdt)

    return kernel


def _stack_cols(v: jnp.ndarray) -> jnp.ndarray:
    """[B, N, K] -> [B, K*N, 1] with out[b, kk*n+i] = v[b, i, kk]."""
    b, n, k = v.shape
    return jnp.transpose(v, (0, 2, 1)).reshape(b, k * n, 1)


def gcl_message_agg(
    wi: jnp.ndarray,          # [B, N, H] receiver projection (w_i h)
    wj: jnp.ndarray,          # [B, N, H] source projection (w_j h + b)
    idx: jnp.ndarray,         # [B, N, K] int neighbor indices
    radial: jnp.ndarray,      # [B, N, K] current-x squared distances
    dist0: jnp.ndarray,       # [B, N, K] entry squared distances
    kmask: jnp.ndarray,       # [B, N, K] edge validity (float)
    we: jnp.ndarray,          # [E=2, H] edge-feature kernel rows
    w2: jnp.ndarray,          # [H, H] edge_out kernel
    w2b: jnp.ndarray,         # [H] edge_out bias
    att: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (kernel [H,1], bias [1])
    norm_factor: float,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """GCL message pass + sum-aggregation as one Pallas call.

    Returns agg [B, N, H] in ``compute_dtype`` — exactly
    ``_aggregate(silu-att-gated edge MLP messages)`` of models/egnn.py's
    neighbor-list GCL (aggregation_method='sum').
    """
    b, n, hdim = wi.shape
    k = idx.shape[-1]
    cdt = compute_dtype

    n_pad = _round_up(n, 128)  # lane dim of the in-kernel one-hot
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        wi = jnp.pad(wi, pad)
        wj = jnp.pad(wj, pad)
        pad_nk = [(0, 0), (0, n_pad - n), (0, 0)]
        idx = jnp.pad(idx, pad_nk)
        radial = jnp.pad(radial, pad_nk)
        dist0 = jnp.pad(dist0, pad_nk)
        kmask = jnp.pad(kmask, pad_nk)  # zero: padded receivers emit 0

    col_s = _stack_cols(idx.astype(jnp.int32))
    kms_s = _stack_cols(kmask.astype(jnp.float32))
    rad_s = _stack_cols(radial.astype(jnp.float32))
    d0_s = _stack_cols(dist0.astype(jnp.float32))

    attention = att is not None
    if attention:
        atk, atb = att
        atk = atk.astype(cdt)
        atb = atb.reshape(1, 1).astype(jnp.float32)
    else:
        atk = jnp.zeros((hdim, 1), cdt)
        atb = jnp.zeros((1, 1), jnp.float32)

    kernel = _make_kernel(n_pad, k, hdim, attention,
                          float(norm_factor), cdt)
    kn = k * n_pad
    im_b = lambda bi: (bi, 0, 0)
    im_w2 = lambda bi: (0, 0)
    vspec = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            vspec((1, n_pad, hdim), im_b),
            vspec((1, n_pad, hdim), im_b),
            vspec((1, kn, 1), im_b),
            vspec((1, kn, 1), im_b),
            vspec((1, kn, 1), im_b),
            vspec((1, kn, 1), im_b),
            vspec((2, hdim), im_w2),
            vspec((hdim, hdim), im_w2),
            vspec((1, hdim), im_w2),
            vspec((hdim, 1), im_w2),
            vspec((1, 1), im_w2),
        ],
        out_specs=vspec((1, n_pad, hdim), im_b),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hdim), cdt),
        interpret=interpret,
    )(
        wi.astype(cdt), wj.astype(cdt),
        col_s, kms_s, rad_s, d0_s,
        we.astype(cdt), w2.astype(cdt),
        w2b.reshape(1, hdim).astype(jnp.float32),
        atk, atb,
    )
    return out[:, :n]
