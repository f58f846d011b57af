"""Data pipeline + training loops on tiny synthetic data."""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu import config as cfgmod
from cmdgen_tpu.chem.sdf import parse_sdf_block, read_sdf, write_sdf
from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs
from cmdgen_tpu.data import crossdocked, dataset as ds
from cmdgen_tpu.models.egnn import EGNNConfig
from cmdgen_tpu.models.gcpg import GCPG
from cmdgen_tpu.train import gcpg_train
from cmdgen_tpu.train.diffphar_train import train_diffphar

ETHANOL_SDF = """ethanol
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    2.1000    1.3000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0  0  0  0
  2  3  1  0  0  0  0
M  END
"""


def _pdb_line(serial, name, res, chain, resid, x, y, z, element):
    return (
        f"ATOM  {serial:>5} {name:<4} {res:<3} {chain}{resid:>4}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {element:>2}"
    )


@pytest.fixture(scope="module")
def tiny_crossdocked(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cd")
    rng = np.random.RandomState(0)
    pairs = []
    for n in range(6):
        # pocket: 4 residues near the ligand
        lines = []
        serial = 1
        for ri in range(1, 5):
            base = rng.randn(3) * 2.0
            for name, el in [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]:
                x, y, z = base + rng.randn(3) * 0.4
                lines.append(_pdb_line(serial, name, "ALA", "A", ri, x, y, z, el))
                serial += 1
        pdb = tmp / f"pocket_{n}.pdb"
        pdb.write_text("\n".join(lines))
        sdf = tmp / f"lig_{n}.sdf"
        sdf.write_text(ETHANOL_SDF)
        split = "test" if n >= 5 else "train"
        pairs.append((split, str(pdb), str(sdf)))
    out = tmp / "processed"
    stats = crossdocked.process_dataset(pairs, out, val_fraction_from_train=2)
    return out, stats


def test_sdf_roundtrip(tmp_path):
    mol, coords = parse_sdf_block(ETHANOL_SDF)
    assert mol.n_atoms == 3 and coords.shape == (3, 3)
    assert [a.symbol for a in mol.atoms] == ["C", "C", "O"]
    p = tmp_path / "out.sdf"
    write_sdf(p, [(["C", "C", "O"], coords, "ethanol")],
              bonds_list=[[(0, 1, 1), (1, 2, 1)]])
    back = read_sdf(p)
    assert len(back) == 1
    np.testing.assert_allclose(back[0][1], coords, atol=1e-3)


def test_preprocessing_produces_npz(tiny_crossdocked):
    out, stats = tiny_crossdocked
    assert (out / "train.npz").exists()
    assert (out / "val.npz").exists()
    assert (out / "test.npz").exists()
    assert (out / "size_distribution.npy").exists()
    assert stats["n_failed"] == 0
    d = ds.DiffPharDataset(out / "train.npz")
    assert len(d) == 5
    b = d.padded_batch([0, 1])
    assert b["phar_x"].shape[0] == 2
    assert b["phar_h"].shape[-1] == 8
    assert b["pocket_h"].shape[-1] == 11
    # centered: joint mean ~ 0
    joint_sum = (
        (b["phar_x"] * b["phar_mask"][..., None]).sum(1)
        + (b["pocket_x"] * b["pocket_mask"][..., None]).sum(1)
    )
    assert np.abs(joint_sum).max() < 1e-3 * max(
        1, np.abs(b["pocket_x"]).max()
    ) + 1e-2


def test_diffphar_training_loop(tiny_crossdocked, tmp_path):
    out, _ = tiny_crossdocked
    cfg = cfgmod.full_atom_config()
    cfg = dataclasses.replace(
        cfg,
        dynamics=dataclasses.replace(
            cfg.dynamics,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        ),
        ddpm=dataclasses.replace(cfg.ddpm, timesteps=5),
        train=dataclasses.replace(
            cfg.train, batch_size=4, n_epochs=2, dp=1,
        ),
    )
    logs = []
    state, model = train_diffphar(
        cfg, out, tmp_path / "ckpt", max_steps=2,
        log_fn=lambda s, m: logs.append((s, m)),
    )
    assert (tmp_path / "ckpt" / "last").exists()
    assert (tmp_path / "ckpt" / "best").exists()
    # reload round trip
    from cmdgen_tpu.train.checkpoint import load_checkpoint

    payload, meta = load_checkpoint(tmp_path / "ckpt", "last")
    assert "params" in payload and meta["step"] == 2
    assert "config" in meta


def test_diffphar_training_resume(tiny_crossdocked, tmp_path):
    """resume_from restores params+opt_state at the recorded step, skips
    covered epochs (resident path), and continues to the new horizon."""
    out, _ = tiny_crossdocked
    cfg = cfgmod.full_atom_config()
    base = dataclasses.replace(
        cfg,
        dynamics=dataclasses.replace(
            cfg.dynamics,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        ),
        ddpm=dataclasses.replace(cfg.ddpm, timesteps=5),
    )
    # resident multistep config: 2 epochs, then resume to 4
    mk_train = lambda n: dataclasses.replace(
        base.train, batch_size=2, n_epochs=n, dp=1,
        steps_per_call=2, resident_data="on", ckpt_epochs=1,
    )
    cfg1 = dataclasses.replace(base, train=mk_train(2))
    state1, _ = train_diffphar(cfg1, out, tmp_path / "ck")
    from cmdgen_tpu.train.checkpoint import load_checkpoint

    _, meta1 = load_checkpoint(tmp_path / "ck", "last")
    cfg2 = dataclasses.replace(base, train=mk_train(4))
    state2, _ = train_diffphar(
        cfg2, out, tmp_path / "ck", resume_from=tmp_path / "ck"
    )
    _, meta2 = load_checkpoint(tmp_path / "ck", "last")
    assert meta2["step"] > meta1["step"]
    # params moved on from the restored point
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state1.params, state2.params,
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_diffphar_resume_ema_seeding(tiny_crossdocked, tmp_path):
    """EMA state across resume boundaries: a non-EMA checkpoint resumed
    with ema_decay>0 seeds the EMA from the RESTORED params (never the
    fresh random init), and an EMA checkpoint resumed with ema_decay=0
    drops the stale EMA (train_step would never update it while eval
    and checkpointing prefer it)."""
    out, _ = tiny_crossdocked
    cfg = cfgmod.full_atom_config()
    base = dataclasses.replace(
        cfg,
        dynamics=dataclasses.replace(
            cfg.dynamics,
            egnn=EGNNConfig(hidden_nf=16, n_layers=1, inv_sublayers=1),
        ),
        ddpm=dataclasses.replace(cfg.ddpm, timesteps=5),
    )
    mk_train = lambda n, ema: dataclasses.replace(
        base.train, batch_size=2, n_epochs=n, dp=1,
        steps_per_call=2, resident_data="on", ckpt_epochs=1, ema_decay=ema,
    )
    # 1 epoch without EMA -> checkpoint has no ema_params
    cfg1 = dataclasses.replace(base, train=mk_train(1, 0.0))
    train_diffphar(cfg1, out, tmp_path / "ck")
    from cmdgen_tpu.train.checkpoint import load_checkpoint

    p1, _ = load_checkpoint(tmp_path / "ck", "last")
    assert "ema_params" not in p1
    # resume with EMA on: continue 1 more epoch; the saved EMA must sit
    # near the restored params (seeded from them), not near random init
    cfg2 = dataclasses.replace(base, train=mk_train(2, 0.9))
    train_diffphar(cfg2, out, tmp_path / "ck", resume_from=tmp_path / "ck")
    p2, _ = load_checkpoint(tmp_path / "ck", "last")
    assert "ema_params" in p2
    dist_restored = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p2["ema_params"], p1["params"],
    )))
    assert dist_restored < 1.0  # same basin: seeded + a few decayed steps
    # resume the EMA checkpoint with EMA off: stale EMA must be dropped
    cfg3 = dataclasses.replace(base, train=mk_train(3, 0.0))
    state3, _ = train_diffphar(
        cfg3, out, tmp_path / "ck", resume_from=tmp_path / "ck"
    )
    assert state3.ema_params is None
    p3, _ = load_checkpoint(tmp_path / "ck", "last")
    assert "ema_params" not in p3


def test_beta_annealer_matches_reference_phases():
    betas = list(__import__("itertools").islice(
        gcpg_train.gen_beta(3e-4, 1e-2, 6, 18, 24), 30
    ))
    assert all(b == pytest.approx(3e-4) for b in betas[:6])
    assert betas[24] == pytest.approx(1e-2, rel=1e-6)
    assert betas[29] == pytest.approx(1e-2, rel=1e-6)
    assert all(b2 >= b1 - 1e-12 for b1, b2 in zip(betas, betas[1:]))


def test_gcpg_dataset_and_train_step():
    smiles = ["CCO", "CC(=O)O", "c1ccccc1", "CC(C)CO", "CCN", "CCOC"] * 2
    props = {"MW": [46.0] * 12, "logP": [0.2] * 12}
    tok = Tokenizer(gen_vocabs(smiles))
    data = ds.GCPGSmilesDataset(
        smiles, props, tok, max_len=16,
        use_random_input_smiles=True, corrupt=True, seed=0,
    )
    batch = data.padded_batch(list(range(6)))
    assert batch is not None
    np_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    b = np_batch["inputs"].shape[0]

    model = GCPG(
        cfgmod.GCPGModelConfig(
            max_len=16, hidden_dim=32, n_layers=1, ff_dim=32, n_head=4,
            pp_encoder_n_layer=1, dropout=0.1,
        ),
        vocab_size=len(tok),
    )
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        np_batch["inputs"], np_batch["input_valid"],
        np_batch["pp_h"], np_batch["pp_e"], np_batch["pp_mask"],
        np_batch["targets"], np_batch["props"][:, :7],
    )
    tcfg = cfgmod.GCPGTrainConfig()
    optimizer = gcpg_train.gcpg_optimizer(tcfg, steps_per_epoch=10)
    step = jax.jit(
        gcpg_train.make_gcpg_train_step(model, optimizer, tcfg.condition_gate)
    )
    opt_state = optimizer.init(params)
    losses = []
    for i in range(8):
        params, opt_state, metrics = step(
            params, opt_state, jax.random.PRNGKey(2), np_batch, 3e-4
        )
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_gcpg_consensus_noise_graph_randomization():
    """consensus_noise re-draws sizes from the decode-time prior and
    jitters distances, leaving types/mask/mapping/tokens exact; the
    distance matrix stays symmetric, zero-diagonal, >= 0.5 off-diagonal;
    noise=0 reproduces the exact graphs."""
    from cmdgen_tpu.chem.posp import IDX2SIZE

    smiles = ["CC(=O)Oc1ccccc1C(=O)O", "NCCc1ccc(O)c(O)c1",
              "CC(C)Cc1ccc(cc1)C(C)C(=O)O"] * 4
    props = {"MW": [180.0] * 12}
    tok = Tokenizer(gen_vocabs(smiles))
    kw = dict(max_len=64, use_random_input_smiles=False, corrupt=False)
    exact = ds.GCPGSmilesDataset(smiles, props, tok, seed=3, **kw)
    noisy = ds.GCPGSmilesDataset(
        smiles, props, tok, seed=3, consensus_noise=1.0, **kw
    )
    n_size_changed = n_dist_changed = 0
    for i in range(len(smiles)):
        a, b = exact.get_item(i), noisy.get_item(i)
        assert (a is None) == (b is None)
        if a is None:
            continue
        # same molecule-derived structure (types, mask, mapping, tokens);
        # the same seed keeps the SUS feature draw aligned up to the first
        # noise consumption, so compare per-item invariants only
        k = int(b["pp_mask"].sum())
        assert k >= 2
        d = b["pp_e"][:k, :k, 0]
        np.testing.assert_allclose(d, d.T, atol=0)
        assert np.all(np.diag(d) == 0.0)
        off = d[~np.eye(k, dtype=bool)]
        assert np.all(off >= 0.5)
        # noisy sizes come from the decode-time prior support
        for r in range(k):
            types = np.flatnonzero(b["pp_h"][r, :7] > 0)
            support = {s for t in types for s in IDX2SIZE[int(t)][0]}
            assert int(b["pp_h"][r, 7]) in support
        n_size_changed += int(
            a["pp_mask"].sum() == k
            and not np.array_equal(a["pp_h"][:k, 7], b["pp_h"][:k, 7])
        )
        n_dist_changed += int(
            a["pp_mask"].sum() == k
            and not np.allclose(a["pp_e"][:k, :k], b["pp_e"][:k, :k])
        )
    assert n_dist_changed > 0  # the jitter actually fires

    # noise=0.0 is the exact path (fresh instances: get_item advances the
    # dataset RNG, so equality only holds between same-seed fresh objects)
    fresh_a = ds.GCPGSmilesDataset(smiles, props, tok, seed=3, **kw)
    fresh_b = ds.GCPGSmilesDataset(
        smiles, props, tok, seed=3, consensus_noise=0.0, **kw
    )
    for i in range(len(smiles)):
        a, c = fresh_a.get_item(i), fresh_b.get_item(i)
        if a is None:
            continue
        np.testing.assert_array_equal(a["pp_h"], c["pp_h"])
        np.testing.assert_array_equal(a["pp_e"], c["pp_e"])


def test_gcpg_resident_multistep_matches_host_step():
    """The device-resident scan path must reproduce the host-fed step
    exactly: same batch content (via stacked_variants of a deterministic
    dataset), same key flow, bit-identical parameter update on CPU f32."""
    smiles = ["CCO", "CC(=O)O", "c1ccccc1", "CC(C)CO", "CCN", "CCOC"]
    props = {"MW": [46.0] * 6, "logP": [0.2] * 6}
    tok = Tokenizer(gen_vocabs(smiles))
    # deterministic items => stacked row i == padded_batch([i]) content
    data = ds.GCPGSmilesDataset(
        smiles, props, tok, max_len=16,
        use_random_input_smiles=False, corrupt=False, seed=0,
    )
    stacked = data.stacked_variants(1)
    assert stacked is not None and stacked["inputs"].shape[0] == 6
    batch = data.padded_batch(list(range(6)))
    np_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    # compact-dtype reconstruction matches the host batch exactly
    np.testing.assert_array_equal(stacked["inputs"], batch["inputs"])
    np.testing.assert_array_equal(stacked["targets"], batch["targets"])
    np.testing.assert_array_equal(
        stacked["mapping"].astype(np.float32), batch["mapping"]
    )
    np.testing.assert_array_equal(
        (stacked["inputs"] != tok.PAD).astype(np.float32),
        batch["input_valid"],
    )

    model = GCPG(
        cfgmod.GCPGModelConfig(
            max_len=16, hidden_dim=32, n_layers=1, ff_dim=32, n_head=4,
            pp_encoder_n_layer=1, dropout=0.1,
        ),
        vocab_size=len(tok),
    )
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        np_batch["inputs"], np_batch["input_valid"],
        np_batch["pp_h"], np_batch["pp_e"], np_batch["pp_mask"],
        np_batch["targets"], np_batch["props"][:, :7],
    )
    tcfg = cfgmod.GCPGTrainConfig()
    optimizer = gcpg_train.gcpg_optimizer(tcfg, steps_per_epoch=10)
    step = jax.jit(
        gcpg_train.make_gcpg_train_step(model, optimizer, tcfg.condition_gate)
    )
    multistep = jax.jit(
        gcpg_train.make_gcpg_multistep_resident(
            model, optimizer, tcfg.condition_gate, int(tok.PAD)
        )
    )
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(7)
    resident_data = {k: jnp.asarray(v) for k, v in stacked.items()}
    idx = jnp.arange(6, dtype=jnp.int32)[None, :]  # one scan step, batch 0..5
    p_res, o_res, metrics = multistep(
        params, opt_state, rng, resident_data, idx, jnp.float32(3e-4)
    )
    # replicate the scan body's key derivation for the host step
    _, sub = jax.random.split(rng)
    p_host, o_host, m_host = step(params, opt_state, sub, np_batch, 3e-4)
    assert np.allclose(
        float(metrics["loss"][0]), float(m_host["loss"]), atol=0, rtol=0
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_res, p_host,
    )


def test_bucketed_batches(tiny_crossdocked):
    out, _ = tiny_crossdocked
    d = ds.DiffPharDataset(out / "train.npz")
    rng = np.random.RandomState(0)
    seen = 0
    for b in d.iter_batches(2, rng, bucket=8):
        assert b["pocket_x"].shape[1] % 8 == 0 or \
            b["pocket_x"].shape[1] == d.n_pocket_max
        # all valid nodes survive the bucketing
        assert (b["pocket_mask"].sum(1) > 0).all()
        seen += 1
    assert seen == 2  # 5 train complexes, batch 2, drop_last


def test_prefetch_iterator():
    from cmdgen_tpu.data.prefetch import prefetch

    out = list(prefetch(iter(range(10)), buffer_size=2))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("x")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        list(prefetch(boom()))


def test_checkpoint_restores_as_host_numpy(tmp_path):
    """Cross-platform restore: arrays saved from device-placed jax arrays
    come back as host numpy (no saved-sharding replay — the failure mode
    that made TPU-written checkpoints unrestorable on CPU)."""
    import jax
    import jax.numpy as jnp

    from cmdgen_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    dev = jax.devices()[3]  # non-default device: sharding metadata differs
    payload = {
        "params": {"w": jax.device_put(jnp.arange(6.0).reshape(2, 3), dev)},
        "step_arr": np.arange(4),
    }
    save_checkpoint(tmp_path, payload, step=7, monitor_value=1.0)
    out, meta = load_checkpoint(tmp_path, "last")
    w = out["params"]["w"]
    assert isinstance(w, np.ndarray)
    np.testing.assert_allclose(w, np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(out["step_arr"], np.arange(4))
    assert meta["step"] == 7
