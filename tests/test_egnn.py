"""EGNN equivariance and masking invariants.

The defining properties (which the reference never tests, SURVEY.md §4):
  - h outputs are invariant to rotations/translations of the inputs
  - coordinate outputs are equivariant: f(Rx+t) = R f(x)+t
  - padded nodes influence nothing
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNN, EGNNConfig
from cmdgen_tpu.ops.masked import pair_mask


def _rand_rotation(rng):
    a = rng.randn(3, 3)
    q, r = np.linalg.qr(a)
    q = q @ np.diag(np.sign(np.diag(r)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q, dtype=jnp.float32)


SMALL = EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(1)
    b, n, d = 2, 12, 6
    h = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(b, n, 3), dtype=jnp.float32)
    mask = jnp.asarray(
        (np.arange(n)[None, :] < np.array([8, 12])[:, None]).astype(np.float32)
    )
    edge_mask = pair_mask(mask, mask)
    model = EGNN(SMALL, out_node_nf=d)
    params = model.init(jax.random.PRNGKey(0), h, x, edge_mask, mask)
    return model, params, h, x, mask, edge_mask, rng


def test_rotation_equivariance(setup):
    model, params, h, x, mask, edge_mask, rng = setup
    R = _rand_rotation(rng)
    t = jnp.asarray(rng.randn(3), dtype=jnp.float32)
    h1, x1 = model.apply(params, h, x, edge_mask, mask)
    h2, x2 = model.apply(params, h, x @ R.T + t, edge_mask, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)
    want = (x1 @ R.T + t) * mask[..., None]
    np.testing.assert_allclose(
        np.asarray(x2 * mask[..., None]), np.asarray(want), atol=2e-4
    )


def test_padding_invariance(setup):
    model, params, h, x, mask, edge_mask, rng = setup
    # scribble over padded entries; valid outputs must not change
    noise_h = jnp.asarray(rng.randn(*h.shape), dtype=jnp.float32)
    noise_x = jnp.asarray(rng.randn(*x.shape), dtype=jnp.float32)
    pad = (1 - mask)[..., None]
    h1, x1 = model.apply(params, h, x, edge_mask, mask)
    h2, x2 = model.apply(
        params, h + noise_h * pad, x + noise_x * pad, edge_mask, mask
    )
    np.testing.assert_allclose(
        np.asarray(h1 * mask[..., None]), np.asarray(h2 * mask[..., None]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(x1 * mask[..., None]), np.asarray(x2 * mask[..., None]), atol=1e-5
    )


def test_dynamics_equivariance_and_pocket_frozen():
    rng = np.random.RandomState(2)
    b, n_p, n_q = 2, 5, 10
    cfg = DynamicsConfig(
        phar_nf=8,
        residue_nf=4,
        joint_nf=8,
        edge_cutoff=None,
        egnn=EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1),
    )
    xh_p = jnp.asarray(rng.randn(b, n_p, 3 + 8), dtype=jnp.float32)
    xh_q = jnp.asarray(rng.randn(b, n_q, 3 + 4), dtype=jnp.float32)
    t = jnp.asarray(rng.rand(b, 1), dtype=jnp.float32)
    m_p = jnp.ones((b, n_p), dtype=jnp.float32)
    m_q = jnp.asarray(
        (np.arange(n_q)[None, :] < np.array([7, 10])[:, None]).astype(np.float32)
    )
    model = EGNNDynamics(cfg)
    params = model.init(jax.random.PRNGKey(0), xh_p, xh_q, t, m_p, m_q)

    eps_p1, eps_q1 = model.apply(params, xh_p, xh_q, t, m_p, m_q)
    # rotate coordinates only
    R = _rand_rotation(rng)
    rot = lambda xh: jnp.concatenate([xh[..., :3] @ R.T, xh[..., 3:]], axis=-1)
    eps_p2, eps_q2 = model.apply(params, rot(xh_p), rot(xh_q), t, m_p, m_q)
    # velocity part rotates, feature part invariant
    np.testing.assert_allclose(
        np.asarray(eps_p2[..., :3]), np.asarray(eps_p1[..., :3] @ R.T), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(eps_p2[..., 3:]), np.asarray(eps_p1[..., 3:]), atol=2e-4
    )
    # conditional mode: pocket velocities are frozen at zero
    assert float(jnp.max(jnp.abs(eps_q1[..., :3]))) == 0.0


def test_edge_cutoff_limits_influence():
    """A node farther than the cutoff from everything must not affect others."""
    rng = np.random.RandomState(3)
    cfg = DynamicsConfig(
        phar_nf=8,
        residue_nf=4,
        joint_nf=8,
        edge_cutoff=6.0,
        egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
    )
    b, n_p, n_q = 1, 4, 6
    xh_p = jnp.asarray(rng.randn(b, n_p, 11), dtype=jnp.float32)
    xh_q = jnp.asarray(rng.randn(b, n_q, 7), dtype=jnp.float32)
    t = jnp.zeros((b, 1), dtype=jnp.float32)
    m_p = jnp.ones((b, n_p))
    m_q = jnp.ones((b, n_q))
    model = EGNNDynamics(cfg)
    params = model.init(jax.random.PRNGKey(0), xh_p, xh_q, t, m_p, m_q)
    # teleport last pocket node 1000 Å away; its features must stop mattering
    far = xh_q.at[0, -1, :3].set(jnp.asarray([1000.0, 1000.0, 1000.0]))
    far_feat = far.at[0, -1, 3:].add(5.0)
    eps_p1, _ = model.apply(params, xh_p, far, t, m_p, m_q)
    eps_p2, _ = model.apply(params, xh_p, far_feat, t, m_p, m_q)
    np.testing.assert_allclose(np.asarray(eps_p1), np.asarray(eps_p2), atol=1e-5)


def test_neighbor_list_parity_with_dense(setup):
    """neighbor_k >= max neighbor count => exactly the dense computation."""
    import dataclasses

    model, params, h, x, mask, edge_mask, rng = setup
    # cutoff adjacency so rows have varying (but < K) neighbor counts
    d2 = jnp.sum((x[:, :, None] - x[:, None]) ** 2, axis=-1)
    em = edge_mask * (d2 <= 2.0).astype(edge_mask.dtype)
    max_nb = int(jnp.max(jnp.sum(em, axis=-1)))
    k = max_nb + 2
    assert k < x.shape[1]
    dense_model = EGNN(SMALL, out_node_nf=h.shape[-1])
    nb_model = EGNN(
        dataclasses.replace(SMALL, neighbor_k=k), out_node_nf=h.shape[-1]
    )
    h1, x1 = dense_model.apply(params, h, x, em, mask)
    h2, x2 = nb_model.apply(params, h, x, em, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)


def test_neighbor_list_overflow_keeps_nearest(setup):
    """k smaller than true neighbor counts: still finite, equivariant, and
    the kept edges are the k nearest (spot-checked via build_neighbor_list)."""
    import dataclasses

    from cmdgen_tpu.models.egnn import build_neighbor_list

    model, params, h, x, mask, edge_mask, rng = setup
    k = 4
    onehot, kmask, ridx = build_neighbor_list(x, edge_mask, k)
    idx = jnp.argmax(onehot, axis=-1)
    np.testing.assert_array_equal(np.asarray(ridx), np.asarray(idx))
    d2 = np.asarray(jnp.sum((x[:, :, None] - x[:, None]) ** 2, axis=-1))
    em = np.asarray(edge_mask)
    for b in range(x.shape[0]):
        for i in range(x.shape[1]):
            if em[b, i].sum() == 0:
                continue
            valid_d = np.where(em[b, i] > 0, d2[b, i], np.inf)
            want = set(np.argsort(valid_d, kind="stable")[: min(k, int(em[b, i].sum()))])
            got = set(np.asarray(idx[b, i])[np.asarray(kmask[b, i]) > 0])
            assert got == want, (b, i, got, want)
    nb_model = EGNN(
        dataclasses.replace(SMALL, neighbor_k=k), out_node_nf=h.shape[-1]
    )
    h2, x2 = nb_model.apply(params, h, x, edge_mask, mask)
    assert np.isfinite(np.asarray(h2)).all() and np.isfinite(np.asarray(x2)).all()


def test_update_rows_exact(setup):
    """Statically slicing the coordinate pass to the movable receivers
    (update_rows) must be bit-equivalent to computing all receivers and
    masking: frozen rows' aggregates are multiplied by zero either way."""
    import dataclasses

    model, params, h, x, mask, edge_mask, rng = setup
    n = x.shape[1]
    r = 3
    ucm = jnp.asarray(
        (np.arange(n)[None, :] < r).astype(np.float32)
    ) * jnp.ones((x.shape[0], 1))
    for cfg in (SMALL, dataclasses.replace(SMALL, neighbor_k=6)):
        m = EGNN(cfg, out_node_nf=h.shape[-1])
        h1, x1 = m.apply(params, h, x, edge_mask, mask, ucm)
        h2, x2 = m.apply(params, h, x, edge_mask, mask, ucm, r)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


def test_neighbor_list_equivariance(setup):
    import dataclasses

    model, params, h, x, mask, edge_mask, rng = setup
    nb_model = EGNN(
        dataclasses.replace(SMALL, neighbor_k=6), out_node_nf=h.shape[-1]
    )
    R = _rand_rotation(rng)
    t = jnp.asarray(rng.randn(3), dtype=jnp.float32)
    h1, x1 = nb_model.apply(params, h, x, edge_mask, mask)
    h2, x2 = nb_model.apply(params, h, x @ R.T + t, edge_mask, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)
    want = (x1 @ R.T + t) * mask[..., None]
    np.testing.assert_allclose(
        np.asarray(x2 * mask[..., None]), np.asarray(want), atol=2e-4
    )


def test_sin_embedding_values():
    """sinusoids_embedding matches the reference formula
    (egnn_new.py:249-260): 6 geometric frequencies 2*pi*4^k/15 over
    sqrt(d2+1e-8), 12 output channels."""
    from cmdgen_tpu.models.egnn import sinusoids_embedding

    d2 = jnp.asarray([[0.0], [4.0], [36.0]])
    out = np.asarray(sinusoids_embedding(d2))
    assert out.shape == (3, 12)
    freqs = 2 * np.pi * (4.0 ** np.arange(6)) / 15.0
    d = np.sqrt(np.asarray(d2) + 1e-8)
    want = np.concatenate([np.sin(d * freqs), np.cos(d * freqs)], axis=-1)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_sin_embedding_equivariance():
    """The sin_embedding option preserves E(3) equivariance (features are
    rotation-invariant distances)."""
    rng = np.random.RandomState(3)
    b, n, d = 2, 10, 6
    h = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(b, n, 3), dtype=jnp.float32)
    mask = jnp.ones((b, n), dtype=jnp.float32)
    edge_mask = pair_mask(mask, mask)
    cfg = EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1,
                     sin_embedding=True)
    model = EGNN(cfg, out_node_nf=d)
    params = model.init(jax.random.PRNGKey(0), h, x, edge_mask, mask)
    R = _rand_rotation(rng)
    t = jnp.asarray(rng.randn(3), dtype=jnp.float32)
    h1, x1 = model.apply(params, h, x, edge_mask, mask)
    h2, x2 = model.apply(params, h, x @ R.T + t, edge_mask, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(x1 @ R.T + t), atol=3e-4
    )
    # the embedded-edge path must differ from the raw-distance path
    base = EGNN(EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1),
                out_node_nf=d)
    bparams = base.init(jax.random.PRNGKey(0), h, x, edge_mask, mask)
    hb, _ = base.apply(bparams, h, x, edge_mask, mask)
    assert not np.allclose(np.asarray(h1), np.asarray(hb))


def test_sin_embedding_neighbor_list_matches_dense():
    """neighbor_k large enough to cover every edge reproduces the dense
    sin_embedding path exactly."""
    rng = np.random.RandomState(5)
    b, n, d = 2, 8, 6
    h = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(b, n, 3), dtype=jnp.float32)
    mask = jnp.ones((b, n), dtype=jnp.float32)
    edge_mask = pair_mask(mask, mask)
    cfg_d = EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1,
                       sin_embedding=True)
    cfg_k = dataclasses.replace(cfg_d, neighbor_k=n)
    model_d = EGNN(cfg_d, out_node_nf=d)
    model_k = EGNN(cfg_k, out_node_nf=d)
    params = model_d.init(jax.random.PRNGKey(0), h, x, edge_mask, mask)
    h1, x1 = model_d.apply(params, h, x, edge_mask, mask)
    h2, x2 = model_k.apply(params, h, x, edge_mask, mask)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=2e-4)


def test_gnn_dynamics_mode():
    """mode='gnn_dynamics' (dynamics.py:63-64,112-115): runs, right shapes,
    learns coordinates through node features (and is intentionally NOT
    equivariant)."""
    rng = np.random.RandomState(7)
    b, n_p, n_q = 2, 4, 7
    cfg = DynamicsConfig(
        phar_nf=8, residue_nf=5, joint_nf=16, edge_cutoff=None,
        mode="gnn_dynamics",
        egnn=EGNNConfig(hidden_nf=32, n_layers=2, inv_sublayers=1),
    )
    dyn = EGNNDynamics(cfg)
    xh_phar = jnp.asarray(rng.randn(b, n_p, 3 + 8), dtype=jnp.float32)
    xh_pocket = jnp.asarray(rng.randn(b, n_q, 3 + 5), dtype=jnp.float32)
    t = jnp.zeros((b, 1))
    m_p = jnp.ones((b, n_p))
    m_q = jnp.ones((b, n_q))
    params = dyn.init(jax.random.PRNGKey(0), xh_phar, xh_pocket, t, m_p, m_q)
    eps_p, eps_q = dyn.apply(params, xh_phar, xh_pocket, t, m_p, m_q)
    assert eps_p.shape == (b, n_p, 3 + 8)
    assert eps_q.shape == (b, n_q, 3 + 5)
    assert np.isfinite(np.asarray(eps_p)).all()
    # translation must CHANGE the output (coords are plain features here)
    shift = jnp.asarray([1.0, -2.0, 0.5])
    xh_phar2 = xh_phar.at[..., :3].add(shift)
    xh_pocket2 = xh_pocket.at[..., :3].add(shift)
    eps_p2, _ = dyn.apply(params, xh_phar2, xh_pocket2, t, m_p, m_q)
    assert not np.allclose(np.asarray(eps_p), np.asarray(eps_p2), atol=1e-4)


def test_gnn_dynamics_trains_in_ddpm():
    """The gnn fallback slots into the conditional DDPM loss/grad path."""
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig

    rng = np.random.RandomState(11)
    b, n_p, n_q = 2, 3, 6
    cfg = DynamicsConfig(
        phar_nf=8, residue_nf=4, joint_nf=8, edge_cutoff=None,
        mode="gnn_dynamics",
        egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
    )
    dyn = EGNNDynamics(cfg)
    model = ConditionalDDPM(DDPMConfig(timesteps=5), dyn)
    phar = PointCloud(
        x=jnp.asarray(rng.randn(b, n_p, 3), dtype=jnp.float32),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, 8, (b, n_p))), 8),
        mask=mask_from_sizes(jnp.full((b,), n_p), n_p),
    )
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, n_q, 3), dtype=jnp.float32),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, 4, (b, n_q))), 4),
        mask=mask_from_sizes(jnp.full((b,), n_q), n_q),
    )
    params = dyn.init(
        jax.random.PRNGKey(0), phar.xh, pocket.xh, jnp.zeros((b, 1)),
        phar.mask, pocket.mask,
    )
    loss_fn = lambda p: jnp.mean(
        model.loss(p, jax.random.PRNGKey(1), phar, pocket, training=True)[0]
    )
    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads)
    )))
    assert gnorm > 0


def test_dense_params_init_matches_nn_dense():
    """_DenseParams must reproduce nn.Dense's param tree bit-for-bit (same
    name -> same path, same lecun_normal kernel, zero bias) so the fused
    matmul rewrites in GCL/PairFirstLayer keep old checkpoints loadable."""
    import flax.linen as nn

    from cmdgen_tpu.models.egnn import _DenseParams

    class Old(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(7, name="node_in")(x)

    class New(nn.Module):
        @nn.compact
        def __call__(self, x):
            k, b = _DenseParams(7, x.shape[-1], name="node_in")()
            return x @ k + b

    x = jnp.ones((2, 5))
    p_old = Old().init(jax.random.PRNGKey(3), x)
    p_new = New().init(jax.random.PRNGKey(3), x)
    chex = jax.tree_util.tree_structure
    assert chex(p_old) == chex(p_new)
    for a, b in zip(jax.tree_util.tree_leaves(p_old),
                    jax.tree_util.tree_leaves(p_new)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
