"""Learned noise schedule (GammaNetwork) wired through the DDPMs.

Covers VERDICT r1 item 4: the 'learned' schedule must be reachable from
config, train through the vlb loss, and satisfy the alpha/sigma/SNR algebra
under a parameterized gamma (reference: en_diffusion.py:29-41, 1058-1096).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
from cmdgen_tpu.diffusion.joint import JointDDPM
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig

TINY_EGNN = EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1)


def _tiny(update_pocket=False):
    dyn_cfg = DynamicsConfig(
        phar_nf=4, residue_nf=5, joint_nf=8,
        update_pocket_coords=update_pocket, egnn=TINY_EGNN,
    )
    ddpm_cfg = DDPMConfig(timesteps=10, noise_schedule="learned", loss_type="vlb")
    dynamics = EGNNDynamics(dyn_cfg)
    cls = JointDDPM if update_pocket else ConditionalDDPM
    model = cls(ddpm_cfg, dynamics)
    b, n_p, n_q = 2, 5, 7
    rng = np.random.RandomState(0)
    phar = PointCloud(
        x=jnp.asarray(rng.randn(b, n_p, 3), jnp.float32),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, 4, (b, n_p))), 4),
        mask=mask_from_sizes(jnp.asarray([4, 5]), n_p),
    )
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, n_q, 3), jnp.float32),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, 5, (b, n_q))), 5),
        mask=mask_from_sizes(jnp.asarray([7, 6]), n_q),
    )
    params = dynamics.init(
        jax.random.PRNGKey(0), phar.xh, pocket.xh,
        jnp.zeros((b, 1)), phar.mask, pocket.mask,
    )
    params = model.init_extra_params(jax.random.PRNGKey(1), params)
    return model, params, phar, pocket


def test_requires_vlb():
    dyn = EGNNDynamics(DynamicsConfig(egnn=TINY_EGNN))
    with pytest.raises(AssertionError):
        ConditionalDDPM(
            DDPMConfig(noise_schedule="learned", loss_type="l2"), dyn
        )


def test_gamma_monotone_and_endpoints():
    model, params, phar, pocket = _tiny()
    assert "gamma_net" in params["params"]
    t = jnp.linspace(0.0, 1.0, 101)
    g = model._gamma_t_norm(params, t)
    assert g.shape == t.shape
    assert np.all(np.diff(np.asarray(g)) >= -1e-6)
    # endpoint normalization => gamma(0) = gamma_0 param, gamma(1) = gamma_1
    np.testing.assert_allclose(float(g[0]), -5.0, atol=1e-4)
    np.testing.assert_allclose(float(g[-1]), 10.0, atol=1e-4)


def test_algebra_under_learned_gamma():
    """Closed-form VDM identities hold for the net's gamma values."""
    from cmdgen_tpu.ops import schedules as sch

    model, params, phar, pocket = _tiny()
    g_s = model._gamma_t_norm(params, jnp.asarray([0.2, 0.5]))
    g_t = model._gamma_t_norm(params, jnp.asarray([0.6, 0.9]))
    a_s, a_t = sch.alpha(g_s), sch.alpha(g_t)
    s_s, s_t = sch.sigma(g_s), sch.sigma(g_t)
    np.testing.assert_allclose(np.asarray(a_t**2 + s_t**2), 1.0, atol=1e-6)
    s2_ts, s_ts, a_ts = sch.sigma_and_alpha_t_given_s(g_t, g_s)
    np.testing.assert_allclose(np.asarray(a_ts), np.asarray(a_t / a_s), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s2_ts), np.asarray(s_t**2 - a_ts**2 * s_s**2),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sch.snr(g_s)), np.asarray(jnp.exp(-g_s)), rtol=1e-6
    )


@pytest.mark.parametrize("joint", [False, True])
def test_learned_schedule_trains(joint):
    """A few optimizer steps on the vlb decrease the loss AND move the
    gamma-net parameters (i.e. gradients reach the schedule)."""
    model, params, phar, pocket = _tiny(update_pocket=joint)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            nll, info = model.loss(p, rng, phar, pocket, training=True)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    def eval_loss(p):
        # fixed keys => the same (t, eps) draws before and after training
        return float(
            np.mean(
                [
                    float(
                        jnp.mean(
                            model.loss(
                                p, jax.random.PRNGKey(1000 + i), phar, pocket,
                                training=True,
                            )[0]
                        )
                    )
                    for i in range(8)
                ]
            )
        )

    g0_before = np.asarray(
        jax.tree_util.tree_leaves(params["params"]["gamma_net"])[0]
    ).copy()
    before = eval_loss(params)
    losses = []
    for i in range(60):
        params, opt_state, loss, grads = step(
            params, opt_state, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    gamma_grads = jax.tree_util.tree_leaves(grads["params"]["gamma_net"])
    assert any(np.any(np.asarray(g) != 0) for g in gamma_grads), (
        "no gradient reached the gamma net"
    )
    g0_after = np.asarray(
        jax.tree_util.tree_leaves(params["params"]["gamma_net"])[0]
    )
    assert not np.allclose(g0_before, g0_after)
    after = eval_loss(params)
    assert after < before, (before, after)
    assert np.isfinite(losses).all()


def test_sampling_with_learned_schedule():
    model, params, phar, pocket = _tiny()
    phar_out, pocket_out = jax.jit(
        lambda p, r: model.sample_given_pocket(
            p, r, pocket, jnp.asarray([4, 5]), 5, timesteps=5
        )
    )(params, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(phar_out.x)).all()
    assert phar_out.h.shape[-1] == 4
