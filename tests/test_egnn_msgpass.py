"""Parity of the per-GCL Pallas message-pass kernel (ops/egnn_msgpass.py)
against the flax XLA neighbor-list path, in interpreter mode (f32) on CPU.

The kernel replaces only the GCL message pass + aggregation; the
parameter tree is identical between modes, so the SAME params drive both
engines and outputs must agree to f32 tolerance.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig


def _setup(b=2, n_p=4, n_q=9, hidden=32, layers=2, cutoff=None, seed=0,
           attention=True, k=None):
    rng = np.random.RandomState(seed)
    cfg = DynamicsConfig(
        phar_nf=8, residue_nf=5, joint_nf=8, edge_cutoff=cutoff,
        egnn=EGNNConfig(
            hidden_nf=hidden, n_layers=layers, inv_sublayers=1,
            attention=attention,
            neighbor_k=k if k is not None else n_p + n_q,
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


def _msgpass_dyn(cfg):
    return EGNNDynamics(dataclasses.replace(
        cfg, egnn=dataclasses.replace(cfg.egnn, msgpass_pallas=True)
    ))


@pytest.mark.parametrize("cutoff", [None, 4.0])
def test_msgpass_matches_flax_conditional(cutoff):
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(cutoff=cutoff)
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    out_p, out_q = _msgpass_dyn(cfg).apply(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )


def test_msgpass_k_truncation_matches_flax_k():
    """K below the true neighbor count: both engines keep the K nearest."""
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(
        n_p=4, n_q=12, cutoff=None, k=8
    )
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    out_p, out_q = _msgpass_dyn(cfg).apply(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )


def test_msgpass_no_attention():
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(
        attention=False, cutoff=4.0
    )
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    out_p, out_q = _msgpass_dyn(cfg).apply(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=2e-4, rtol=1e-4
    )


def test_msgpass_flagship_like_shape():
    """Larger shape (N > 128-lane pad boundary untested elsewhere: here
    N = 8 + 130 pads the one-hot lane dim to 256) with K=12 and 3 blocks."""
    cfg, dyn, params, xh_p, xh_q, t, m_p, m_q = _setup(
        b=2, n_p=8, n_q=130, hidden=64, layers=3, cutoff=6.0, seed=7, k=12
    )
    ref_p, ref_q = dyn.apply(params, xh_p, xh_q, t, m_p, m_q)
    out_p, out_q = _msgpass_dyn(cfg).apply(params, xh_p, xh_q, t, m_p, m_q)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref_p), atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_q), atol=5e-4, rtol=5e-4
    )
