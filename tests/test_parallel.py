"""Data-parallel training on the virtual 8-device mesh.

The key multi-chip invariant (SURVEY.md §4c): the pjit data-parallel
gradient step equals the single-device step on the same global batch.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM, DDPMConfig
from cmdgen_tpu.models.dynamics import DynamicsConfig, EGNNDynamics
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.parallel import mesh as pmesh
from cmdgen_tpu.train import state as tstate


def _setup(b=8):
    dyn = EGNNDynamics(
        DynamicsConfig(
            phar_nf=8, residue_nf=4, joint_nf=8, edge_cutoff=None,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        )
    )
    model = ConditionalDDPM(DDPMConfig(timesteps=10), dyn)
    rng = np.random.RandomState(0)
    n_p, n_q = 5, 9
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
    return model, params, phar, pocket


def test_mesh_construction():
    m = pmesh.make_mesh(dp=4, tp=2)
    assert m.shape == {"dp": 4, "tp": 2}


def test_dp_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    model, params, phar, pocket = _setup(b=8)
    optimizer = tstate.reference_optimizer(1e-3)
    train_step = tstate.make_diffusion_train_step(model, optimizer, clip_grad=True)
    rng = jax.random.PRNGKey(3)

    # single device
    state1 = tstate.init_state(params, optimizer)
    state1, metrics1 = jax.jit(train_step)(state1, rng, phar, pocket)

    # 8-way data parallel
    m = pmesh.make_mesh(dp=8, tp=1)
    state8 = tstate.init_state(params, optimizer)
    state8 = pmesh.replicate(state8, m)
    phar8 = pmesh.shard_batch(phar, m)
    pocket8 = pmesh.shard_batch(pocket, m)
    with m:
        state8, metrics8 = jax.jit(train_step)(state8, rng, phar8, pocket8)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics8["loss"]), rtol=1e-4
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_dp_tp_step_matches_single_device():
    """dp=4 x tp=2: batch sharded over dp, wide Dense kernels/biases
    Megatron-column-sharded over tp (pmesh.shard_params_tp). GSPMD inserts
    the collectives; the step must equal the single-device step."""
    assert len(jax.devices()) >= 8
    model, params, phar, pocket = _setup(b=8)
    optimizer = tstate.reference_optimizer(1e-3)
    train_step = tstate.make_diffusion_train_step(model, optimizer, clip_grad=True)
    rng = jax.random.PRNGKey(3)

    state1 = tstate.init_state(params, optimizer)
    state1, metrics1 = jax.jit(train_step)(state1, rng, phar, pocket)

    m = pmesh.make_mesh(dp=4, tp=2)
    # the rule must actually shard something at these shapes
    shardings = [
        pmesh.tp_sharding(a, m)
        for a in jax.tree_util.tree_leaves(params)
    ]
    assert any(s.spec != pmesh.P() for s in shardings)
    state_tp = tstate.init_state(params, optimizer)
    state_tp = pmesh.shard_params_tp(state_tp, m)
    phar_tp = pmesh.shard_batch(phar, m)
    pocket_tp = pmesh.shard_batch(pocket, m)
    with m:
        state_tp, metrics_tp = jax.jit(train_step)(
            state_tp, rng, phar_tp, pocket_tp
        )

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics_tp["loss"]), rtol=1e-4
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state_tp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_multistep_matches_single_steps():
    """make_diffusion_multistep under one lax.scan == the same M updates
    through make_diffusion_train_step with identical rng splits."""
    model, params, phar, pocket = _setup(b=4)
    optimizer = tstate.reference_optimizer(1e-3)
    single = jax.jit(tstate.make_diffusion_train_step(model, optimizer, True))
    multi = jax.jit(tstate.make_diffusion_multistep(model, optimizer, True))
    m = 3
    phar_stack = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * m), phar
    )
    pocket_stack = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * m), pocket
    )
    rng = jax.random.PRNGKey(11)

    s1 = tstate.init_state(params, optimizer)
    key = rng
    losses = []
    for _ in range(m):
        key, sub = jax.random.split(key)
        s1, met = single(s1, sub, phar, pocket)
        losses.append(float(met["loss"]))

    s2 = tstate.init_state(params, optimizer)
    s2, mstack = multi(s2, rng, phar_stack, pocket_stack)
    np.testing.assert_allclose(
        np.asarray(mstack["loss"]), np.asarray(losses), rtol=1e-5
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    assert int(s2.step) == m


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    eps_phar, eps_pocket = out
    assert eps_phar.shape[-1] == 3 + 8
    ge.dryrun_multichip(8)


def test_ema_update_tracks_params():
    """EMA params move toward the raw params with the warmup-ramped decay
    and are used by eval_params when kept."""
    model, params, phar, pocket = _setup(b=4)
    optimizer = tstate.reference_optimizer(1e-3)
    step = jax.jit(tstate.make_diffusion_train_step(
        model, optimizer, clip_grad=False, ema_decay=0.5,
    ))
    state = tstate.init_state(params, optimizer, ema=True)
    assert state.ema_params is not None
    rng = jax.random.PRNGKey(0)
    s1, _ = step(state, rng, phar, pocket)
    # at step 0 the warmup ramp gives d = min(0.5, 1/10) = 0.1:
    # ema = 0.1 * init + 0.9 * params_1
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    expect = 0.1 * leaf(params) + 0.9 * leaf(s1.params)
    np.testing.assert_allclose(np.asarray(leaf(s1.ema_params)),
                               np.asarray(expect), rtol=1e-5)
    assert tstate.eval_params(s1) is s1.ema_params
    # without ema the eval params are the raw params
    s0 = tstate.init_state(params, optimizer)
    assert tstate.eval_params(s0) is s0.params


def test_multistep_updates_ema():
    model, params, phar, pocket = _setup(b=4)
    optimizer = tstate.reference_optimizer(1e-3)
    multi = jax.jit(tstate.make_diffusion_multistep(
        model, optimizer, clip_grad=False, ema_decay=0.9,
    ))
    state = tstate.init_state(params, optimizer, ema=True)
    stack = lambda pc: jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a]), pc
    )
    s, _ = multi(state, jax.random.PRNGKey(1), stack(phar), stack(pocket))
    leaf = lambda t: np.asarray(jax.tree_util.tree_leaves(t)[0])
    assert not np.allclose(leaf(s.ema_params), leaf(params))
    assert not np.allclose(leaf(s.ema_params), leaf(s.params))


def test_stratified_t_marginal_uniform():
    """Stratified timestep sampling covers {lowest..T} evenly within one
    batch and is uniform per-sample across keys."""
    from cmdgen_tpu.diffusion.cddpm import sample_t_int

    T, b = 10, 44
    t = np.asarray(sample_t_int(jax.random.PRNGKey(0), b, 0, T, True))
    assert t.min() >= 0 and t.max() <= T
    # one batch covers every value: 44 draws over 11 values, stratified
    assert len(np.unique(t)) == T + 1
    # per-sample marginal: sample index 3 over many keys is uniform
    vals = np.array([
        float(np.asarray(
            sample_t_int(jax.random.PRNGKey(k), b, 1, T, True)
        )[3]) for k in range(300)
    ])
    assert vals.min() >= 1 and vals.max() <= T
    counts = np.bincount(vals.astype(int), minlength=T + 1)[1:]
    assert counts.min() > 10  # all 10 values hit, roughly uniformly


def test_resident_multistep_matches_host_multistep():
    """Gathering batches on device from resident arrays == feeding the same
    batches from host, with identical rng flow."""
    model, params, phar, pocket = _setup(b=8)
    optimizer = tstate.reference_optimizer(1e-3)
    host = jax.jit(tstate.make_diffusion_multistep(model, optimizer, True))
    res = jax.jit(
        tstate.make_diffusion_multistep_resident(model, optimizer, True)
    )
    data = {
        "phar_x": phar.x, "phar_h": phar.h, "phar_mask": phar.mask,
        "pocket_x": pocket.x, "pocket_h": pocket.h, "pocket_mask": pocket.mask,
    }
    idx = jnp.asarray([[3, 1, 0, 2], [7, 4, 6, 5], [0, 5, 2, 7]], jnp.int32)
    take = lambda pc, row: jax.tree_util.tree_map(lambda a: a[row], pc)
    phar_stack = jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *[take(phar, r) for r in idx]
    )
    pocket_stack = jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *[take(pocket, r) for r in idx]
    )
    rng = jax.random.PRNGKey(5)
    s1 = tstate.init_state(params, optimizer)
    s2 = tstate.init_state(params, optimizer)
    s1, m1 = host(s1, rng, phar_stack, pocket_stack)
    s2, m2 = res(s2, rng, data, idx)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=1e-6
    )


def test_fsdp_step_matches_single_device():
    """dp=8 FSDP (ZeRO-3): params + optimizer moments sharded over dp via
    pmesh.shard_params_fsdp; GSPMD all-gathers each parameter at use and
    reduce-scatters its gradient. The step must equal the single-device
    step, and the rule must actually shard something at these shapes."""
    assert len(jax.devices()) >= 8
    model, params, phar, pocket = _setup(b=8)
    optimizer = tstate.reference_optimizer(1e-3)
    train_step = tstate.make_diffusion_train_step(model, optimizer, clip_grad=True)
    rng = jax.random.PRNGKey(3)

    state1 = tstate.init_state(params, optimizer)
    state1, metrics1 = jax.jit(train_step)(state1, rng, phar, pocket)

    m = pmesh.make_mesh(dp=8, tp=1)
    shardings = [
        pmesh.fsdp_sharding(a, m) for a in jax.tree_util.tree_leaves(params)
    ]
    assert any(s.spec != pmesh.P() for s in shardings)
    state_f = tstate.init_state(params, optimizer)
    state_f = pmesh.shard_params_fsdp(state_f, m)
    phar_f = pmesh.shard_batch(phar, m)
    pocket_f = pmesh.shard_batch(pocket, m)
    with m:
        state_f, metrics_f = jax.jit(train_step)(state_f, rng, phar_f, pocket_f)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics_f["loss"]), rtol=1e-4
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state_f.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_fsdp_tp_step_matches_single_device():
    """dp=4 x tp=2 with the combined FSDP x Megatron layout: last axis on
    tp where eligible, largest remaining axis on dp."""
    assert len(jax.devices()) >= 8
    model, params, phar, pocket = _setup(b=8)
    optimizer = tstate.reference_optimizer(1e-3)
    train_step = tstate.make_diffusion_train_step(model, optimizer, clip_grad=True)
    rng = jax.random.PRNGKey(3)

    state1 = tstate.init_state(params, optimizer)
    state1, metrics1 = jax.jit(train_step)(state1, rng, phar, pocket)

    m = pmesh.make_mesh(dp=4, tp=2)
    # at least one kernel must carry BOTH axes
    specs = [
        pmesh.fsdp_sharding(a, m).spec
        for a in jax.tree_util.tree_leaves(params)
    ]
    assert any("dp" in s and "tp" in s for s in specs)
    state_f = tstate.init_state(params, optimizer)
    state_f = pmesh.shard_params_fsdp(state_f, m)
    phar_f = pmesh.shard_batch(phar, m)
    pocket_f = pmesh.shard_batch(pocket, m)
    with m:
        state_f, metrics_f = jax.jit(train_step)(state_f, rng, phar_f, pocket_f)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics_f["loss"]), rtol=1e-4
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state_f.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
