"""Conditional DDPM: loss structure, sampler invariants, tiny overfit."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
from cmdgen_tpu.diffusion.size_prior import SizePrior
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.ops.masked import masked_sum

PHAR_NF, POCKET_NF = 8, 5
NP_MAX, NQ_MAX = 6, 12


def _make_model(com_free=True, loss_type="l2", T=20):
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=PHAR_NF,
            residue_nf=POCKET_NF,
            joint_nf=8,
            edge_cutoff=None,
            update_pocket_coords=False,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    hist = np.ones((NP_MAX + 1, NQ_MAX + 1))
    cfg = DDPMConfig(timesteps=T, loss_type=loss_type, com_free=com_free)
    return ConditionalDDPM(cfg, dyn, SizePrior(hist))


def _make_batch(rng, b=3):
    sizes_p = rng.randint(2, NP_MAX + 1, size=b)
    sizes_q = rng.randint(4, NQ_MAX + 1, size=b)
    mp = mask_from_sizes(jnp.asarray(sizes_p), NP_MAX)
    mq = mask_from_sizes(jnp.asarray(sizes_q), NQ_MAX)
    hp = jax.nn.one_hot(
        jnp.asarray(rng.randint(0, PHAR_NF, size=(b, NP_MAX))), PHAR_NF
    )
    hq = jax.nn.one_hot(
        jnp.asarray(rng.randint(0, POCKET_NF, size=(b, NQ_MAX))), POCKET_NF
    )
    phar = PointCloud(
        x=jnp.asarray(rng.randn(b, NP_MAX, 3), dtype=jnp.float32),
        h=hp * mp[..., None],
        mask=mp,
    )
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, NQ_MAX, 3) * 2, dtype=jnp.float32),
        h=hq * mq[..., None],
        mask=mq,
    )
    return phar, pocket


@pytest.fixture(scope="module")
def model_and_params():
    model = _make_model()
    rng = np.random.RandomState(0)
    phar, pocket = _make_batch(rng)
    t = jnp.zeros((phar.batch, 1))
    params = model.dynamics.init(
        jax.random.PRNGKey(0), phar.xh, pocket.xh, t, phar.mask, pocket.mask
    )
    return model, params, phar, pocket


def test_loss_shapes_and_finiteness(model_and_params):
    model, params, phar, pocket = model_and_params
    nll, info = model.loss(params, jax.random.PRNGKey(1), phar, pocket, True)
    assert nll.shape == (phar.batch,)
    assert bool(jnp.all(jnp.isfinite(nll)))
    for k, v in info.items():
        assert bool(jnp.isfinite(v)), k


def test_vlb_loss_runs(model_and_params):
    model, params, phar, pocket = model_and_params
    model_vlb = _make_model(loss_type="vlb")
    nll, _ = model_vlb.loss(params, jax.random.PRNGKey(2), phar, pocket, False)
    assert bool(jnp.all(jnp.isfinite(nll)))


def test_kl_prior_small(model_and_params):
    """With a well-formed schedule, q(z_T|x) ~ N(0,1) so the prior KL is tiny
    (the reference keeps this term as a schedule sanity check)."""
    model, params, phar, pocket = model_and_params
    phar_n = model.normalize(phar)
    x_c, _ = model._center(phar_n.x, pocket.x, phar.mask, pocket.mask)
    xh0 = jnp.concatenate([x_c, phar_n.h], axis=-1)
    kl = model._kl_prior(params, xh0, phar.mask, phar.size)
    assert float(jnp.max(jnp.abs(kl))) < 0.1


def test_sampler_invariants(model_and_params):
    model, params, phar, pocket = model_and_params
    num_nodes = jnp.asarray([3, 5, 6])
    sample_fn = jax.jit(
        functools.partial(model.sample_given_pocket, n_phar_max=NP_MAX)
    )
    out_phar, out_pocket = sample_fn(
        params, jax.random.PRNGKey(3), pocket, num_nodes
    )
    # sizes respected
    np.testing.assert_array_equal(np.asarray(out_phar.size), [3, 5, 6])
    # one-hot types on valid nodes
    hsum = np.asarray(jnp.sum(out_phar.h, axis=-1))
    msk = np.asarray(out_phar.mask)
    np.testing.assert_allclose(hsum * msk, msk, atol=1e-6)
    # CoM-free: pharmacophore CoM is ~0 relative to cloud scale
    com = np.asarray(masked_sum(out_phar.x, out_phar.mask))
    scale = np.abs(np.asarray(out_phar.x)).max() + 1e-9
    assert np.abs(com).max() / scale < 1e-2
    # outputs finite
    assert np.isfinite(np.asarray(out_phar.x)).all()
    # pocket relative geometry preserved (only translated)
    d_in = np.asarray(pocket.x[0, 1] - pocket.x[0, 0])
    d_out = np.asarray(out_pocket.x[0, 1] - out_pocket.x[0, 0])
    np.testing.assert_allclose(d_in, d_out, atol=1e-3)


def test_sampler_recovers_oracle_target():
    """End-to-end sampler correctness: with the analytically optimal
    eps-model for a single-x0 dataset (eps = (z - alpha_t x0)/sigma_t),
    the reverse chain must reproduce x0 almost exactly — full chain AND
    respaced. This pins sampler/schedule algebra independently of any
    trained network (it localized a round-2 quality plateau to dataset
    geometry, not the sampler)."""
    from cmdgen_tpu.ops import schedules as sch
    from cmdgen_tpu.ops.masked import masked_mean

    b, n_p, n_q, T = 4, 5, 10, 20
    rng = np.random.RandomState(0)
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, n_q, 3).astype(np.float32) * 3.0),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, POCKET_NF, (b, n_q))),
                         POCKET_NF),
        mask=jnp.ones((b, n_q)),
    )
    off = rng.randn(n_p, 3).astype(np.float32) * 1.5
    off -= off.mean(0)
    h0 = jax.nn.one_hot(jnp.asarray(rng.randint(0, PHAR_NF, (n_p,))), PHAR_NF)
    base = _make_model(T=T)

    def oracle(params, z_phar, xh_pocket, t_norm, phar_mask, pocket_mask):
        gamma = base._gamma_t_norm(params, t_norm[:, 0])
        a, s = sch.alpha(gamma), sch.sigma(gamma)
        pocket_com = masked_mean(xh_pocket[..., :3], pocket_mask)
        x0 = pocket_com[:, None, :] + jnp.asarray(off)[None]
        xh0 = jnp.concatenate(
            [x0, jnp.broadcast_to(h0 / base.cfg.norm_h,
                                  (z_phar.shape[0], n_p, PHAR_NF))], -1
        )
        eps = (z_phar - a[:, None, None] * xh0) / s[:, None, None]
        return eps * phar_mask[..., None], jnp.zeros_like(xh_pocket)

    model = ConditionalDDPM(base.cfg, base.dynamics, base.size_prior,
                            apply_fn=oracle)
    params = base.dynamics.init(
        jax.random.PRNGKey(0), jnp.zeros((b, n_p, 3 + PHAR_NF)), pocket.xh,
        jnp.zeros((b, 1)), jnp.ones((b, n_p)), pocket.mask,
    )
    for steps in (T, 5):
        out, _ = model.sample_given_pocket(
            params, jax.random.PRNGKey(1), pocket, jnp.full((b,), n_p),
            n_p, timesteps=steps,
        )
        xc = np.asarray(out.x) - np.asarray(out.x).mean(1, keepdims=True)
        np.testing.assert_allclose(xc, np.broadcast_to(off, xc.shape),
                                   atol=0.05)
        types = np.asarray(out.h).argmax(-1)
        np.testing.assert_array_equal(
            types, np.broadcast_to(np.asarray(h0.argmax(-1)), types.shape)
        )


def test_respaced_sampling(model_and_params):
    """timesteps < T runs a respaced chain over an evenly-strided
    subsequence of the schedule: full-T request must equal the default
    chain exactly, the pair table must span [0, T] monotonically, and a
    short respaced chain must keep every sampler invariant."""
    from cmdgen_tpu.diffusion.cddpm import respaced_st_pairs

    model, params, phar, pocket = model_and_params
    T = model.cfg.timesteps

    pairs = np.asarray(respaced_st_pairs(T, 5))
    assert pairs.shape == (5, 2)
    assert pairs[0, 1] == T and pairs[-1, 0] == 0
    assert (pairs[:, 0] < pairs[:, 1]).all()
    # consecutive: s of row i == t of row i+1
    np.testing.assert_array_equal(pairs[1:, 1], pairs[:-1, 0])
    full = np.asarray(respaced_st_pairs(T, T))
    np.testing.assert_array_equal(full[:, 1], np.arange(T, 0, -1))

    num_nodes = jnp.asarray([3, 5, 6])
    out_default, _ = model.sample_given_pocket(
        params, jax.random.PRNGKey(3), pocket, num_nodes, NP_MAX
    )
    out_full, _ = model.sample_given_pocket(
        params, jax.random.PRNGKey(3), pocket, num_nodes, NP_MAX, timesteps=T
    )
    np.testing.assert_allclose(
        np.asarray(out_default.x), np.asarray(out_full.x), atol=1e-6
    )
    out_fast, _ = model.sample_given_pocket(
        params, jax.random.PRNGKey(4), pocket, num_nodes, NP_MAX, timesteps=5
    )
    assert np.isfinite(np.asarray(out_fast.x)).all()
    np.testing.assert_array_equal(np.asarray(out_fast.size), [3, 5, 6])
    hsum = np.asarray(jnp.sum(out_fast.h, axis=-1))
    msk = np.asarray(out_fast.mask)
    np.testing.assert_allclose(hsum * msk, msk, atol=1e-6)


def test_simple_variant_runs():
    model = _make_model(com_free=False)
    rng = np.random.RandomState(4)
    phar, pocket = _make_batch(rng)
    t = jnp.zeros((phar.batch, 1))
    params = model.dynamics.init(
        jax.random.PRNGKey(0), phar.xh, pocket.xh, t, phar.mask, pocket.mask
    )
    nll, _ = model.loss(params, jax.random.PRNGKey(5), phar, pocket, True)
    assert bool(jnp.all(jnp.isfinite(nll)))
    out_phar, _ = model.sample_given_pocket(
        params, jax.random.PRNGKey(6), pocket, jnp.asarray([3, 4, 5]), NP_MAX
    )
    assert np.isfinite(np.asarray(out_phar.x)).all()


def test_overfit_tiny_batch(model_and_params):
    """One jitted train step must reduce the loss on a fixed tiny batch."""
    model, params, phar, pocket = model_and_params
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            nll, _ = model.loss(p, key, phar, pocket, True)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(7)
    first = None
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, key)  # fixed key
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))


def test_sample_chain_frames(model_and_params):
    from cmdgen_tpu.diffusion.cddpm import sample_chain_given_pocket

    model, params, phar, pocket = model_and_params
    out_phar, out_pocket, frames = sample_chain_given_pocket(
        model, params, jax.random.PRNGKey(11), pocket,
        jnp.asarray([3, 4, 5]), NP_MAX, keep_frames=5,
    )
    assert frames.shape[1:] == (3, NP_MAX, 3)
    assert frames.shape[0] >= 5
    assert np.isfinite(np.asarray(frames)).all()
    np.testing.assert_array_equal(np.asarray(out_phar.size), [3, 4, 5])


def test_clamp_x_bounds_sampled_coords():
    """Static coordinate thresholding (DDPMConfig.clamp_x): sampling stays
    bounded with the knob on, and the default (None) path is unchanged."""
    import dataclasses

    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
    from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
    from cmdgen_tpu.models.egnn import EGNNConfig

    rng = np.random.RandomState(0)
    b, n_p, n_q = 2, 4, 8
    dyn = EGNNDynamics(DynamicsConfig(
        phar_nf=8, residue_nf=4, joint_nf=8, edge_cutoff=None,
        egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
    ))
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, n_q, 3) * 50, dtype=jnp.float32),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, 4, (b, n_q))), 4),
        mask=mask_from_sizes(jnp.full((b,), n_q), n_q),
    )
    params = dyn.init(
        jax.random.PRNGKey(0), jnp.zeros((b, n_p, 11)), pocket.xh,
        jnp.zeros((b, 1)), jnp.ones((b, n_p)), pocket.mask,
    )
    cfg = DDPMConfig(timesteps=10)
    base = ConditionalDDPM(cfg, dyn)
    clamped = ConditionalDDPM(
        dataclasses.replace(cfg, clamp_x=5.0), dyn
    )
    nn_ = jnp.full((b,), n_p)
    out_c, _ = clamped.sample_given_pocket(
        params, jax.random.PRNGKey(2), pocket, nn_, n_p
    )
    # clamp is applied before CoM re-centering, so the bound on the
    # centered output is 2*clamp (each coord within clamp, CoM within
    # clamp); untrained nets on wide pockets would otherwise blow up
    x = np.asarray(out_c.x)[np.asarray(out_c.mask) > 0.5]
    assert np.abs(x).max() <= 2 * 5.0 + 1e-3
    out_b, _ = base.sample_given_pocket(
        params, jax.random.PRNGKey(2), pocket, nn_, n_p
    )
    assert not np.allclose(np.asarray(out_b.x), np.asarray(out_c.x))


def test_check_norm_values_guard(model_and_params):
    """Reference init guard (en_diffusion.py:64-77): 8 sigmas of t=0 noise
    must stay below one normalized one-hot unit. Default norm_h passes;
    an absurd norm_h raises."""
    import dataclasses

    model, params, _, _ = model_and_params
    model.check_norm_values(params)  # flagship normalization: fine
    bad = ConditionalDDPM(
        dataclasses.replace(model.cfg, norm_h=1e4), model.dynamics,
        model.size_prior,
    )
    with pytest.raises(ValueError, match="norm_h"):
        bad.check_norm_values(params)


def test_dynamics_nan_guard():
    """The denoiser zeroes non-finite velocities (reference
    dynamics.py:129-131): pathological coordinates (1e20 -> inf/nan pair
    math) must still produce finite eps outputs."""
    rng = np.random.RandomState(0)
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=PHAR_NF, residue_nf=POCKET_NF, joint_nf=8,
            edge_cutoff=None, update_pocket_coords=False,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    b = 2
    mp = mask_from_sizes(jnp.full((b,), NP_MAX), NP_MAX)
    mq = mask_from_sizes(jnp.full((b,), NQ_MAX), NQ_MAX)
    xh_p = jnp.concatenate(
        [jnp.asarray(rng.randn(b, NP_MAX, 3) * 1e20, jnp.float32),
         jax.nn.one_hot(jnp.zeros((b, NP_MAX), jnp.int32), PHAR_NF)],
        axis=-1,
    )
    xh_q = jnp.concatenate(
        [jnp.asarray(rng.randn(b, NQ_MAX, 3) * 1e20, jnp.float32),
         jax.nn.one_hot(jnp.zeros((b, NQ_MAX), jnp.int32), POCKET_NF)],
        axis=-1,
    )
    params = dyn.init(
        jax.random.PRNGKey(0), xh_p, xh_q, jnp.zeros((b, 1)), mp, mq
    )
    eps_p, _ = dyn.apply(params, xh_p, xh_q, jnp.full((b, 1), 0.5), mp, mq)
    assert np.isfinite(np.asarray(eps_p[..., :3])).all()


def test_ddim_eta1_equals_ancestral(model_and_params):
    """DDIM at eta=1 must reproduce the ancestral DDPM chain EXACTLY (the
    VP identity sqrt(sigma_s^2 - sigma_post^2) = alpha_ts sigma_s^2/sigma_t
    collapses the DDIM eps coefficient to sigma2_ts/(alpha_ts sigma_t)):
    both the hoisted per-step scalars and whole-chain samples agree."""
    import dataclasses

    from cmdgen_tpu.diffusion.cddpm import respaced_st_pairs

    model, params, phar, pocket = model_and_params
    m1 = ConditionalDDPM(
        dataclasses.replace(model.cfg, ddim_eta=1.0),
        model.dynamics, model.size_prior,
    )
    pairs = respaced_st_pairs(model.cfg.timesteps, model.cfg.timesteps)
    np.testing.assert_allclose(
        np.asarray(m1._reverse_scalars(params, pairs)),
        np.asarray(model._reverse_scalars(params, pairs)),
        rtol=1e-5, atol=1e-6,
    )
    num_nodes = jnp.asarray([3, 5, 6])
    o_ddim, _ = m1.sample_given_pocket(
        params, jax.random.PRNGKey(5), pocket, num_nodes, NP_MAX
    )
    o_anc, _ = model.sample_given_pocket(
        params, jax.random.PRNGKey(5), pocket, num_nodes, NP_MAX
    )
    np.testing.assert_allclose(
        np.asarray(o_ddim.x), np.asarray(o_anc.x), rtol=1e-4, atol=1e-4
    )


def test_ddim_eta0_deterministic_and_invariants(model_and_params):
    """eta=0: the posterior width column is exactly zero (the scan noise is
    multiplied away — the chain is deterministic given z_T), and sampling
    keeps every invariant (sizes, one-hot types, CoM-free, finite)."""
    import dataclasses

    from cmdgen_tpu.diffusion.cddpm import respaced_st_pairs

    model, params, phar, pocket = model_and_params
    m0 = ConditionalDDPM(
        dataclasses.replace(model.cfg, ddim_eta=0.0),
        model.dynamics, model.size_prior,
    )
    pairs = respaced_st_pairs(model.cfg.timesteps, model.cfg.timesteps)
    scal = np.asarray(m0._reverse_scalars(params, pairs))
    np.testing.assert_array_equal(scal[:, 3], 0.0)
    assert np.isfinite(scal).all()

    num_nodes = jnp.asarray([3, 5, 6])
    out, _ = m0.sample_given_pocket(
        params, jax.random.PRNGKey(6), pocket, num_nodes, NP_MAX
    )
    np.testing.assert_array_equal(np.asarray(out.size), [3, 5, 6])
    assert np.isfinite(np.asarray(out.x)).all()
    hsum = np.asarray(jnp.sum(out.h, axis=-1))
    msk = np.asarray(out.mask)
    np.testing.assert_allclose(hsum * msk, msk, atol=1e-6)
    com = np.asarray(masked_sum(out.x, out.mask))
    scale = np.abs(np.asarray(out.x)).max() + 1e-9
    assert np.abs(com).max() / scale < 1e-2


def test_ddim_eta0_recovers_oracle_target():
    """With the analytically optimal eps-model, the DDIM eta=0 chain must
    recover x0 — full chain AND respaced — to a TIGHTER tolerance than the
    ancestral sampler (no posterior noise is injected along the chain)."""
    from cmdgen_tpu.ops import schedules as sch
    from cmdgen_tpu.ops.masked import masked_mean

    b, n_p, n_q, T = 4, 5, 10, 20
    rng = np.random.RandomState(0)
    pocket = PointCloud(
        x=jnp.asarray(rng.randn(b, n_q, 3).astype(np.float32) * 3.0),
        h=jax.nn.one_hot(jnp.asarray(rng.randint(0, POCKET_NF, (b, n_q))),
                         POCKET_NF),
        mask=jnp.ones((b, n_q)),
    )
    off = rng.randn(n_p, 3).astype(np.float32) * 1.5
    off -= off.mean(0)
    h0 = jax.nn.one_hot(jnp.asarray(rng.randint(0, PHAR_NF, (n_p,))), PHAR_NF)
    base = _make_model(T=T)

    def oracle(params, z_phar, xh_pocket, t_norm, phar_mask, pocket_mask):
        gamma = base._gamma_t_norm(params, t_norm[:, 0])
        a, s = sch.alpha(gamma), sch.sigma(gamma)
        pocket_com = masked_mean(xh_pocket[..., :3], pocket_mask)
        x0 = pocket_com[:, None, :] + jnp.asarray(off)[None]
        xh0 = jnp.concatenate(
            [x0, jnp.broadcast_to(h0 / base.cfg.norm_h,
                                  (z_phar.shape[0], n_p, PHAR_NF))], -1
        )
        eps = (z_phar - a[:, None, None] * xh0) / s[:, None, None]
        return eps * phar_mask[..., None], jnp.zeros_like(xh_pocket)

    import dataclasses

    cfg = dataclasses.replace(base.cfg, ddim_eta=0.0)
    model = ConditionalDDPM(cfg, base.dynamics, base.size_prior,
                            apply_fn=oracle)
    params = base.dynamics.init(
        jax.random.PRNGKey(0), jnp.zeros((b, n_p, 3 + PHAR_NF)), pocket.xh,
        jnp.zeros((b, 1)), jnp.ones((b, n_p)), pocket.mask,
    )
    for steps in (T, 5):
        out, _ = model.sample_given_pocket(
            params, jax.random.PRNGKey(1), pocket, jnp.full((b,), n_p),
            n_p, timesteps=steps,
        )
        xc = np.asarray(out.x) - np.asarray(out.x).mean(1, keepdims=True)
        np.testing.assert_allclose(xc, np.broadcast_to(off, xc.shape),
                                   atol=0.02)
        types = np.asarray(out.h).argmax(-1)
        np.testing.assert_array_equal(
            types, np.broadcast_to(np.asarray(h0.argmax(-1)), types.shape)
        )
