"""Joint DDPM: loss, unconditional sampling, RePaint inpainting invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.cddpm import DDPMConfig
from cmdgen_tpu.diffusion.joint import (
    JointDDPM,
    get_repaint_schedule,
    repaint_ops,
)
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig

NP_MAX, NQ_MAX, PHAR_NF, POCKET_NF = 5, 8, 8, 4


@pytest.fixture(scope="module")
def setup():
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=PHAR_NF, residue_nf=POCKET_NF, joint_nf=8,
            edge_cutoff=None, update_pocket_coords=True,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    model = JointDDPM(DDPMConfig(timesteps=8), dyn)
    rng = np.random.RandomState(0)
    b = 2
    mp = mask_from_sizes(jnp.asarray([3, 5]), NP_MAX)
    mq = mask_from_sizes(jnp.asarray([6, 8]), NQ_MAX)
    phar = PointCloud(
        x=jnp.asarray(rng.randn(b, NP_MAX, 3), dtype=jnp.float32),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, PHAR_NF, (b, NP_MAX))), PHAR_NF)
        * mp[..., None],
        mask=mp,
    )
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, NQ_MAX, 3), dtype=jnp.float32),
        h=jax.nn.one_hot(
            jnp.asarray(rng.randint(0, POCKET_NF, (b, NQ_MAX))), POCKET_NF
        )
        * mq[..., None],
        mask=mq,
    )
    params = dyn.init(
        jax.random.PRNGKey(0), phar.xh, pocket.xh, jnp.zeros((b, 1)),
        phar.mask, pocket.mask,
    )
    return model, params, phar, pocket


def test_repaint_schedule_matches_reference_shape():
    # reference example: T=10, jump 2, resamplings 3
    sched = get_repaint_schedule(resamplings=3, jump_length=2, timesteps=10)
    assert sum(sched) - sum(2 for s in sched[:-1]) <= 10
    kinds, svals = repaint_ops(3, 2, 10)
    # denoise steps dominate; total denoise count = sum(schedule)
    assert (kinds == 0).sum() == sum(sched)
    # every op index within range
    assert svals.min() >= 0 and svals.max() < 10
    # trivial schedule: no jumps at all
    kinds1, svals1 = repaint_ops(1, 1, 10)
    assert (kinds1 == 1).sum() == 0 and len(kinds1) == 10
    np.testing.assert_array_equal(svals1, np.arange(9, -1, -1))


def test_joint_loss_finite(setup):
    model, params, phar, pocket = setup
    nll, info = model.loss(params, jax.random.PRNGKey(1), phar, pocket, True)
    assert nll.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(nll)))
    nll2, _ = model.loss(params, jax.random.PRNGKey(2), phar, pocket, False)
    assert bool(jnp.all(jnp.isfinite(nll2)))


def test_joint_sample_com_free(setup):
    model, params, phar, pocket = setup
    out_p, out_q = model.sample(
        params, jax.random.PRNGKey(3),
        jnp.asarray([3, 4]), jnp.asarray([6, 7]), NP_MAX, NQ_MAX,
    )
    # combined CoM ~ 0
    com = np.asarray(
        jnp.sum(out_p.x * out_p.mask[..., None], -2)
        + jnp.sum(out_q.x * out_q.mask[..., None], -2)
    )
    scale = max(np.abs(np.asarray(out_p.x)).max(), 1e-6)
    assert np.abs(com).max() / scale < 5e-2
    assert np.isfinite(np.asarray(out_p.x)).all()


def test_inpaint_keeps_pocket_geometry(setup):
    """Pocket-fixed inpainting: the pocket's internal geometry must be
    exactly preserved (it is only re-noised/translated, never denoised)."""
    model, params, phar, pocket = setup
    out_p, out_q = model.inpaint(
        params, jax.random.PRNGKey(4), phar, pocket,
        phar_fixed=jnp.zeros_like(phar.mask),
        pocket_fixed=jnp.ones_like(pocket.mask),
        resamplings=2, jump_length=2,
    )
    assert np.isfinite(np.asarray(out_p.x)).all()
    # pocket types survive the round trip
    np.testing.assert_allclose(
        np.asarray(out_q.h * out_q.mask[..., None]),
        np.asarray(pocket.h * pocket.mask[..., None]),
        atol=1e-5,
    )
    # relative distances within the pocket: the final z_q x-part equals the
    # (noised) known pocket at gamma_0 which is alpha_0 * x + sigma_0 * eps;
    # with T=8 the noise at t=0 is tiny, so geometry is near-preserved
    d_in = np.linalg.norm(
        np.asarray(pocket.x[0, 1] - pocket.x[0, 0])
    )
    d_out = np.linalg.norm(np.asarray(out_q.x[0, 1] - out_q.x[0, 0]))
    assert abs(d_in - d_out) / d_in < 0.2


def test_joint_ddim_eta1_equals_ancestral(setup):
    """The joint _denoise_step at ddim_eta=1 equals the ancestral step
    exactly (VP identity), checked with an injected noise draw so both
    paths are deterministic."""
    import dataclasses

    model, params, phar, pocket = setup
    m1 = JointDDPM(
        dataclasses.replace(model.cfg, ddim_eta=1.0), model.dynamics
    )
    rng = np.random.RandomState(3)
    z_p = jnp.asarray(rng.randn(2, NP_MAX, 3 + PHAR_NF), dtype=jnp.float32)
    z_q = jnp.asarray(rng.randn(2, NQ_MAX, 3 + POCKET_NF), dtype=jnp.float32)
    noise = model._sample_joint_noise(
        jax.random.PRNGKey(5), phar.mask, pocket.mask
    )
    a = model._denoise_step(
        params, None, z_p, z_q, 3.0, 4.0, phar.mask, pocket.mask, noise=noise
    )
    b = m1._denoise_step(
        params, None, z_p, z_q, 3.0, 4.0, phar.mask, pocket.mask, noise=noise
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-5
        )


def test_joint_ddim_eta0_sample_invariants(setup):
    """Unconditional joint sampling with ddim_eta=0 keeps the CoM-free and
    one-hot invariants and produces finite output."""
    import dataclasses

    model, params, phar, pocket = setup
    m0 = JointDDPM(
        dataclasses.replace(model.cfg, ddim_eta=0.0), model.dynamics
    )
    out_p, out_q = m0.sample(
        params, jax.random.PRNGKey(9), jnp.asarray([3, 5]),
        jnp.asarray([6, 8]), NP_MAX, NQ_MAX,
    )
    assert np.isfinite(np.asarray(out_p.x)).all()
    assert np.isfinite(np.asarray(out_q.x)).all()
    from cmdgen_tpu.ops.masked import masked_sum

    com = np.asarray(
        masked_sum(out_p.x, out_p.mask) + masked_sum(out_q.x, out_q.mask)
    )
    scale = max(
        np.abs(np.asarray(out_p.x)).max(), np.abs(np.asarray(out_q.x)).max()
    ) + 1e-9
    assert np.abs(com).max() / scale < 1e-2
