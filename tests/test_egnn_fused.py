"""Parity of the whole-network fused Pallas EGNN (ops/egnn_fused.py)
against the flax path, in interpreter mode (f32) on CPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.models.dynamics import (
    DynamicsConfig,
    EGNNDynamics,
    make_pallas_apply,
)
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.ops.egnn_fused import egnn_forward_fused


def _setup(b=2, n_p=4, n_q=9, hidden=32, layers=2, cutoff=None, seed=0):
    rng = np.random.RandomState(seed)
    cfg = DynamicsConfig(
        phar_nf=8, residue_nf=5, joint_nf=8, edge_cutoff=cutoff,
        egnn=EGNNConfig(
            hidden_nf=hidden, n_layers=layers, inv_sublayers=1,
            neighbor_k=n_p + n_q,  # covers every edge -> exact vs dense
        ),
    )
    dyn = EGNNDynamics(cfg)
    xh_p = jnp.asarray(rng.randn(b, n_p, 3 + 8) * 2, dtype=jnp.float32)
    xh_q = jnp.asarray(rng.randn(b, n_q, 3 + 5) * 2, dtype=jnp.float32)
    t = jnp.asarray(rng.rand(b, 1), dtype=jnp.float32)
    m_p = jnp.asarray(
        (np.arange(n_p)[None, :] < np.array([n_p, n_p - 1])[:b, None])
        .astype(np.float32)
    )
    m_q = jnp.asarray(
        (np.arange(n_q)[None, :] < np.array([n_q, n_q - 2])[:b, None])
        .astype(np.float32)
    )
    params = dyn.init(jax.random.PRNGKey(1), xh_p, xh_q, t, m_p, m_q)
    return cfg, dyn, params, xh_p, xh_q, t, m_p, m_q


@pytest.mark.parametrize("cutoff,spp", [(None, 1), (4.0, 1), (None, 2),
                                        (4.0, 3)])
def test_fused_matches_flax_conditional(cutoff, spp):
    """spp > 1 exercises multi-sample programs, incl. batch padding
    (b=2 with spp=3 pads one zero sample)."""
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(cutoff=cutoff)
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    apply_fused = make_pallas_apply(
        cfg, interpret=True, compute_dtype=jnp.float32, engine="fused",
        samples_per_program=spp,
    )
    out_p, out_q = apply_fused(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )


def test_fused_matches_flax_joint_mode():
    """update_pocket_coords=True: every row moves (update_rows=None)."""
    rng = np.random.RandomState(3)
    b, n_p, n_q = 2, 3, 7
    cfg = DynamicsConfig(
        phar_nf=8, residue_nf=5, joint_nf=8, edge_cutoff=None,
        update_pocket_coords=True,
        egnn=EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1,
                        neighbor_k=n_p + n_q),
    )
    dyn = EGNNDynamics(cfg)
    xh_p = jnp.asarray(rng.randn(b, n_p, 11) * 2, dtype=jnp.float32)
    xh_q = jnp.asarray(rng.randn(b, n_q, 8) * 2, dtype=jnp.float32)
    t = jnp.zeros((b, 1))
    m_p = jnp.ones((b, n_p))
    m_q = jnp.ones((b, n_q))
    params = dyn.init(jax.random.PRNGKey(0), xh_p, xh_q, t, m_p, m_q)
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    apply_fused = make_pallas_apply(
        cfg, interpret=True, compute_dtype=jnp.float32, engine="fused"
    )
    out_p, out_q = apply_fused(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )


def test_fused_k_truncation_matches_flax_k():
    """With K below the neighbor count, fused == flax neighbor-list mode
    (both keep the K nearest)."""
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(
        n_p=4, n_q=12, cutoff=None
    )
    k = 8
    cfg_k = dataclasses.replace(
        cfg, egnn=dataclasses.replace(cfg.egnn, neighbor_k=k)
    )
    dyn_k = EGNNDynamics(cfg_k)
    ref_p, ref_q = dyn_k.apply(params, xh_p, xh_q, t, m_p, m_q)
    apply_fused = make_pallas_apply(
        cfg_k, interpret=True, compute_dtype=jnp.float32, engine="fused"
    )
    out_p, out_q = apply_fused(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )


def test_fused_flagship_shape_smoke():
    """CA flagship-like shape (8 phar + 110 pocket, 5 layers) through the
    fused kernel in interpret mode: finite and close to flax."""
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(
        b=2, n_p=8, n_q=30, hidden=64, layers=3, cutoff=6.0, seed=7
    )
    k12 = dataclasses.replace(
        cfg, egnn=dataclasses.replace(cfg.egnn, neighbor_k=12)
    )
    dyn12 = EGNNDynamics(k12)
    ref_p, ref_q = dyn12.apply(params, xh_p, xh_q, t, m_p, m_q)
    apply_fused = make_pallas_apply(
        k12, interpret=True, compute_dtype=jnp.float32, engine="fused"
    )
    out_p, out_q = apply_fused(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=5e-4, rtol=5e-4
    )


@pytest.mark.parametrize("cutoff,spp", [(None, 2), (4.0, 3)])
def test_multi_sample_program_matches_flax(cutoff, spp):
    """samples_per_program > 1 must match the flax path, including batch
    padding (b=2 with spp=3 pads one zero sample). (The stacked-samples
    kernel variant this test used to also cover was pruned in round 4
    after tying the per-sample loop exactly on hardware — PERF.md.)"""
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(cutoff=cutoff)
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    apply_spp = make_pallas_apply(
        cfg, interpret=True, compute_dtype=jnp.float32, engine="fused",
        samples_per_program=spp,
    )
    out_p, out_q = apply_spp(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )
