"""Alternative pp-graph encoders + logging utilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.models.ppencoder import PPEncoder


@pytest.mark.parametrize(
    "variant", ["egat", "ggcn", "gine", "graphtransformer"]
)
def test_variant_shapes_and_masking(variant):
    rng = np.random.RandomState(0)
    b, n, d = 3, 8, 32
    h = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    e = jnp.asarray(rng.randn(b, n, n, d), dtype=jnp.float32)
    mask = jnp.asarray(
        (np.arange(n)[None] < np.array([[3], [5], [8]])).astype(np.float32)
    )
    enc = PPEncoder(d, n_layers=2, variant=variant)
    params = enc.init(jax.random.PRNGKey(0), h, e, mask)
    out = enc.apply(params, h, e, mask)
    assert out.shape == (b, n, d)
    assert np.isfinite(np.asarray(out)).all()
    # padded nodes zero
    assert float(jnp.max(jnp.abs(out * (1 - mask)[..., None]))) == 0.0
    # padding invariance: scribbling on padded h must not change valid rows
    noise = jnp.asarray(rng.randn(b, n, d), dtype=jnp.float32)
    out2 = enc.apply(params, h + noise * (1 - mask)[..., None], e, mask)
    np.testing.assert_allclose(
        np.asarray(out * mask[..., None]),
        np.asarray(out2 * mask[..., None]),
        atol=1e-4,
    )


def test_metrics_logger(tmp_path):
    from cmdgen_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(tmp_path, "test", also_print=False)
    lg.log(1, {"loss": 0.5}, split="train")
    lg.log(2, {"loss": 0.4})
    lg.close()
    import json

    lines = (tmp_path / "test.metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[0])["loss/train"] == 0.5


def test_visualize_png(tmp_path):
    from cmdgen_tpu.utils.logging import visualize_molecule_png

    rng = np.random.RandomState(0)
    visualize_molecule_png(
        tmp_path / "m.png", rng.randn(10, 3), types=rng.randint(0, 3, 10),
        type_names=["A", "B", "C"], title="test",
    )
    assert (tmp_path / "m.png").stat().st_size > 1000
