"""Pallas fused EGNN forward must match the dense flax implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.models.egnn import EGNN, EGNNConfig
from cmdgen_tpu.ops.egnn_pallas import egnn_forward_pallas
from cmdgen_tpu.ops.masked import pair_mask


@pytest.mark.parametrize("n,n_layers", [(12, 1), (20, 2)])
def test_pallas_matches_dense(n, n_layers):
    rng = np.random.RandomState(0)
    b, d = 2, 6
    cfg = EGNNConfig(
        hidden_nf=32, n_layers=n_layers, inv_sublayers=1,
        attention=True, tanh=True,
    )
    h = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(b, n, 3), dtype=jnp.float32)
    mask = jnp.asarray(
        (np.arange(n)[None, :] < np.array([n - 3, n])[:, None]).astype(np.float32)
    )
    emask = pair_mask(mask, mask)
    ucm = jnp.asarray(
        (np.arange(n)[None, :] < np.array([4, 5])[:, None]).astype(np.float32)
    )
    model = EGNN(cfg, out_node_nf=d)
    params = model.init(jax.random.PRNGKey(0), h, x, emask, mask, ucm)
    h_ref, x_ref = model.apply(params, h, x, emask, mask, ucm)
    h_pl, x_pl = egnn_forward_pallas(
        params["params"], h, x, emask, mask, ucm,
        n_layers=cfg.n_layers, out_node_nf=d,
        norm_constant=cfg.norm_constant, coords_range=cfg.coords_range,
        normalization_factor=cfg.normalization_factor, tanh=cfg.tanh,
        tile=8, interpret=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref), atol=2e-4)


@pytest.mark.parametrize("n,n_layers", [(12, 1), (20, 2)])
def test_pallas_neighbor_matches_dense(n, n_layers):
    """The fused neighbor-list kernel == the dense flax path whenever K
    bounds the true neighbor count (here: cutoff adjacency with K=8)."""
    rng = np.random.RandomState(1)
    b, d, k = 2, 6, 8
    cfg = EGNNConfig(
        hidden_nf=32, n_layers=n_layers, inv_sublayers=1,
        attention=True, tanh=True,
    )
    h = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(b, n, 3) * 2.0, dtype=jnp.float32)
    mask = jnp.asarray(
        (np.arange(n)[None, :] < np.array([n - 3, n])[:, None]).astype(np.float32)
    )
    # cutoff adjacency sparse enough that every row has < k edges
    d2 = jnp.sum((x[:, :, None] - x[:, None]) ** 2, axis=-1)
    emask = pair_mask(mask, mask) * (d2 <= 2.5).astype(jnp.float32)
    assert int(jnp.max(jnp.sum(emask, axis=-1))) <= k
    ucm = jnp.asarray(
        (np.arange(n)[None, :] < np.array([4, 5])[:, None]).astype(np.float32)
    )
    model = EGNN(cfg, out_node_nf=d)
    params = model.init(jax.random.PRNGKey(0), h, x, emask, mask, ucm)
    h_ref, x_ref = model.apply(params, h, x, emask, mask, ucm)
    h_pl, x_pl = egnn_forward_pallas(
        params["params"], h, x, emask, mask, ucm,
        n_layers=cfg.n_layers, out_node_nf=d,
        norm_constant=cfg.norm_constant, coords_range=cfg.coords_range,
        normalization_factor=cfg.normalization_factor, tanh=cfg.tanh,
        interpret=True, compute_dtype=jnp.float32, neighbor_k=k,
    )
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref), atol=2e-4)
