"""Masked reductions must match ragged (scatter-style) ground truth exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.containers import PointCloud, mask_from_sizes, pad_point_cloud
from cmdgen_tpu.ops import masked


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _random_batch(rng, b=4, n=16, f=5):
    sizes = rng.randint(1, n + 1, size=b)
    x = rng.randn(b, n, 3).astype(np.float32)
    h = rng.randn(b, n, f).astype(np.float32)
    mask = (np.arange(n)[None, :] < sizes[:, None]).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(h), jnp.asarray(mask), sizes


def test_masked_mean_matches_numpy(rng):
    x, _, mask, sizes = _random_batch(rng)
    got = masked.masked_mean(x, mask)
    for i, n in enumerate(sizes):
        np.testing.assert_allclose(got[i], np.asarray(x)[i, :n].mean(0), rtol=1e-5)


def test_sum_except_batch_ignores_padding(rng):
    x, h, mask, sizes = _random_batch(rng)
    got = masked.sum_except_batch(h, mask)
    for i, n in enumerate(sizes):
        np.testing.assert_allclose(got[i], np.asarray(h)[i, :n].sum(), rtol=1e-5)


def test_remove_mean_is_idempotent_and_com_free(rng):
    x, _, mask, _ = _random_batch(rng)
    y = masked.remove_mean(x, mask)
    # CoM is zero
    assert float(jnp.max(jnp.abs(masked.masked_sum(y, mask)))) < 1e-4
    # idempotent
    y2 = masked.remove_mean(y, mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    # padding zeroed
    assert float(jnp.max(jnp.abs(y * (1 - mask)[..., None]))) == 0.0


def test_remove_mean_conditional_moves_both_clouds(rng):
    xa, _, ma, _ = _random_batch(rng, n=10)
    xb, _, mb, _ = _random_batch(rng, n=20)
    ya, yb = masked.remove_mean_conditional(xa, xb, ma, mb)
    # cloud a is CoM-free
    assert float(jnp.max(jnp.abs(masked.masked_sum(ya, ma)))) < 1e-4
    # relative geometry between a and b preserved (same shift applied)
    shift_a = masked.masked_mean(xa - ya, ma)
    shift_b = masked.masked_mean(xb - yb, mb)
    np.testing.assert_allclose(np.asarray(shift_a), np.asarray(shift_b), atol=1e-5)


def test_mask_from_sizes():
    m = mask_from_sizes(jnp.asarray([0, 2, 5]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[0, 0, 0, 0, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]],
    )


def test_pad_point_cloud_roundtrip(rng):
    xs = [rng.randn(3, 3), rng.randn(5, 3)]
    hs = [rng.randn(3, 2), rng.randn(5, 2)]
    pc = pad_point_cloud(xs, hs)
    assert pc.n_max == 5 and pc.batch == 2
    np.testing.assert_array_equal(np.asarray(pc.size), [3, 5])
    np.testing.assert_allclose(np.asarray(pc.x)[1, :5], xs[1], rtol=1e-6)
    # xh concat/split round trip
    pc2 = pc.with_xh(pc.xh)
    np.testing.assert_allclose(np.asarray(pc2.h), np.asarray(pc.h))


def test_pointcloud_is_pytree(rng):
    xs = [rng.randn(3, 3)]
    hs = [rng.randn(3, 2)]
    pc = pad_point_cloud(xs, hs)
    leaves = jax.tree_util.tree_leaves(pc)
    assert len(leaves) == 3
    out = jax.jit(lambda p: p.replace(x=p.x * 2.0))(pc)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(pc.x) * 2.0)
