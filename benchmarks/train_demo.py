"""Training demonstration: both models learn end-to-end on small data.

1. GCPG: train on a few hundred simple molecules; validity of generated
   SMILES should climb far above the untrained baseline.
2. DiffPhar: train on synthetic pocket/pharmacophore pairs; validation NLL
   should drop substantially.

Run: python benchmarks/train_demo.py  (prints one JSON line)
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import random
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def make_smiles_dataset(n=400, seed=0):
    """Simple enumerable drug-fragment-like molecules."""
    rng = random.Random(seed)
    frags = [
        "CC", "CCC", "CCO", "CCN", "CC(C)", "CC=O", "CC(=O)O", "CC(=O)N",
        "c1ccccc1", "Cc1ccccc1", "OCC", "CCS", "CCCl", "CC(N)=O",
    ]
    from cmdgen_tpu.chem.mol import canonical_smiles

    out = set()
    attempts = 0
    while len(out) < n and attempts < 50 * n:
        attempts += 1
        k = rng.randint(1, 3)
        s = "".join(rng.choice(frags) for _ in range(k))
        c = canonical_smiles(s)
        if c:
            out.add(c)
    return sorted(out)


def gcpg_demo(max_epochs=60, quick=False):
    from cmdgen_tpu.chem.metrics import validity
    from cmdgen_tpu.chem.ppgraph import smiles_to_ppgraph
    from cmdgen_tpu.config import GCPGModelConfig, GCPGTrainConfig
    from cmdgen_tpu.models import gcpg as gcpg_mod
    from cmdgen_tpu.train.gcpg_train import train_gcpg

    smiles = make_smiles_dataset(150 if quick else 400)
    mcfg = GCPGModelConfig(
        max_len=48, hidden_dim=128, n_layers=3, ff_dim=256, n_head=4,
        pp_encoder_n_layer=2, dropout=0.1,
    )
    n_epochs = 4 if quick else max_epochs
    tcfg = GCPGTrainConfig(
        batch_size=64, n_epochs=n_epochs, lr=1e-3, cosine_t_max=n_epochs,
    )
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        params, model, tok = train_gcpg(
            mcfg, tcfg, smiles, {}, tmp,
        )
        train_s = time.time() - t0
    # generate from pharmacophores of training molecules
    py_rng = random.Random(1)
    graphs = []
    for s in smiles[:64]:
        g = smiles_to_ppgraph(s, py_rng)
        if g:
            graphs.append(g[:3])
    b = len(graphs)
    toks = gcpg_mod.generate(
        model, params, jax.random.PRNGKey(2),
        jnp.asarray(np.stack([g[0] for g in graphs])),
        jnp.asarray(np.stack([g[1] for g in graphs])),
        jnp.asarray(np.stack([g[2] for g in graphs])),
        jnp.zeros((b, 7)), random_sample=True,
    )
    gen = tok.get_text(np.asarray(toks))
    _, val = validity(gen)
    return {"gcpg_validity_after_training": round(val, 3),
            "gcpg_train_seconds": round(train_s, 1),
            "gcpg_n_train": len(smiles)}


def diffphar_demo(quick=False):
    from cmdgen_tpu.config import full_atom_config
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.models.egnn import EGNNConfig
    from cmdgen_tpu.train import state as tstate
    from cmdgen_tpu.train.diffphar_train import build_model

    cfg = full_atom_config()
    cfg = dataclasses.replace(
        cfg,
        dynamics=dataclasses.replace(
            cfg.dynamics,
            egnn=EGNNConfig(hidden_nf=64, n_layers=2, inv_sublayers=1),
        ),
        ddpm=dataclasses.replace(cfg.ddpm, timesteps=50),
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    b, n_p, n_q = 32, 6, 24

    def batch(key):
        r = np.random.RandomState(key)
        # synthetic "pharmacophore around pocket" geometry
        pocket_x = r.randn(b, n_q, 3).astype(np.float32) * 3.0
        phar_x = pocket_x[:, :n_p] * 0.5 + r.randn(b, n_p, 3) * 0.5
        return (
            PointCloud(
                x=jnp.asarray(phar_x),
                h=jax.nn.one_hot(jnp.asarray(r.randint(0, 8, (b, n_p))), 8),
                mask=jnp.ones((b, n_p)),
            ),
            PointCloud(
                x=jnp.asarray(pocket_x),
                h=jax.nn.one_hot(jnp.asarray(r.randint(0, 11, (b, n_q))), 11),
                mask=jnp.ones((b, n_q)),
            ),
        )

    phar0, pocket0 = batch(0)
    params = model.dynamics.init(
        jax.random.PRNGKey(0), phar0.xh, pocket0.xh, jnp.zeros((b, 1)),
        phar0.mask, pocket0.mask,
    )
    opt = tstate.reference_optimizer(3e-4)
    step_fn = jax.jit(tstate.make_diffusion_train_step(model, opt, True),
                      donate_argnums=(0,))
    state = tstate.init_state(params, opt)
    key = jax.random.PRNGKey(1)

    def val_loss(params, key):
        phar, pocket = batch(999)
        nll, _ = model.loss(params, key, phar, pocket, training=False)
        return float(jnp.mean(nll))

    loss_before = val_loss(state.params, jax.random.PRNGKey(5))
    steps = 60 if quick else 300
    for i in range(steps):
        key, sub = jax.random.split(key)
        phar, pocket = batch(i % 20)
        state, metrics = step_fn(state, sub, phar, pocket)
    loss_after = val_loss(state.params, jax.random.PRNGKey(5))
    return {
        "diffphar_val_nll_before": round(loss_before, 2),
        "diffphar_val_nll_after": round(loss_after, 2),
        "diffphar_steps": steps,
    }


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    out = {}
    out.update(diffphar_demo(quick))
    out.update(gcpg_demo(quick=quick))
    print(json.dumps(out))
