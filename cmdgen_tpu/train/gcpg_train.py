"""GCPG training: loss assembly, KL annealing, condition gating, train step.

Behavioral equivalent of GCPG/train_chembl33_baseline.py (and the
docking-score finetune variant, finetune_docking_epoch1.py): total loss =
LM + beta * KL + weighted mapping BCE, with the 3-phase log/linear KL-beta
annealer, the per-type rarity weights for the mapping head, the
[1,1,1,1,1,0,0] condition gate (score-only [0,0,0,0,0,1,0] for finetuning),
AdamW + cosine LR, and grad-norm clipping at 5.
"""
from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmdgen_tpu.config import GCPGTrainConfig
from cmdgen_tpu.models.gcpg import GCPG

# dataset property rows (data/dataset.py PROPERTY_KEYS:
# [MW, logP, QED, SAS, HBA, HBD, RotaNumBonds, Score, Smi]) -> the model's
# 7-condition layout [MW, logP, QED, SAS, RotaNumBonds, Score, Smi]
# (train_chembl33_baseline.py:148-151: HBA/HBD are carried in the batch but
# never conditioned on)
COND_IDX = np.asarray([0, 1, 2, 3, 6, 7, 8])

# rarity weights per pharmacophore type (train_chembl33_baseline.py:39-40)
PP_TYPE_WEIGHT = (
    1.4891304347826086, 1.0, 8.058823529411764, 1.0378787878787878,
    1.8026315789473686, 2.174603174603175, 17.125,
)


def gen_beta(start: float, end: float, t1: int, t2: int, t3: int) -> Iterator[float]:
    """3-phase KL-beta annealer: hold, log-ramp, linear-ramp, hold
    (train_chembl33_baseline.py:548-569)."""
    for _ in range(t1):
        yield start
    log_s, log_e = np.log(start), np.log(end)
    at = t3 - t1
    cur = start
    for i in range(t2 - t1):
        cur = float(np.exp(log_s + (log_e - log_s) / at * i))
        yield cur
    t = t3 - t2
    delta = (end - cur) / t
    for _ in range(t):
        cur += delta
        yield cur
    while True:
        yield end


def default_beta_schedule(cfg: GCPGTrainConfig) -> Iterator[float]:
    return gen_beta(cfg.kl_beta_min, cfg.kl_beta_max, 6, 18, 24)


def mapping_bce(mapping_scores, mappings, pp_type):
    """Weighted mapping BCE (train_chembl33_baseline.py:166-177).

    mapping_scores: [B, S, 8] sigmoid outputs
    mappings:       [B, S, 8] targets in {0, 1} with -100 = ignore
    pp_type:        [B, 8, 7] node type one-hots (for rarity weights)
    """
    w_type = jnp.asarray(PP_TYPE_WEIGHT)
    sample_weight = pp_type @ w_type  # [B, 8]
    is_pos = (mappings == 1.0).astype(jnp.float32)
    is_valid = (mappings != -100.0).astype(jnp.float32)
    pos_count = jnp.sum(is_pos, axis=1, keepdims=True)  # [B, 1, 8]
    weight = is_pos * (8.0 / (0.001 + pos_count))
    weight = weight + is_valid * sample_weight[:, None, :]
    target = jnp.clip(mappings, 0.0, 1.0)
    p = jnp.clip(mapping_scores, 1e-7, 1 - 1e-7)
    bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    return jnp.mean(weight * bce)


def make_gcpg_train_step(
    model: GCPG, optimizer: optax.GradientTransformation,
    condition_gate: Tuple[int, ...], grad_clip: float = 5.0,
):
    """step(params, opt_state, rng, batch, beta) -> (params, opt_state, metrics)

    batch keys (data/dataset.py GCPGSmilesDataset.padded_batch):
      inputs, input_valid, targets, pp_h, pp_e, pp_mask, mapping, props
    """
    gate = jnp.asarray(condition_gate, dtype=jnp.float32)

    def step(params, opt_state, rng, batch, beta):
        k_z, k_drop = jax.random.split(rng)

        def loss_fn(p):
            conds = batch["props"][:, COND_IDX] * gate[None, :]
            logits, mapping_scores, lm_loss, kl_loss = model.apply(
                p, k_z, batch["inputs"], batch["input_valid"],
                batch["pp_h"], batch["pp_e"], batch["pp_mask"],
                batch["targets"], conds, deterministic=False,
                rngs={"dropout": k_drop},
            )
            map_loss = mapping_bce(
                mapping_scores, batch["mapping"], batch["pp_h"][..., :7]
            )
            total = lm_loss + kl_loss * beta + map_loss
            return total, (lm_loss, kl_loss, map_loss)

        (loss, (lm, kl, mp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss, "lm_loss": lm, "kl_loss": kl,
            "mapping_loss": mp, "grad_norm": gnorm,
        }
        return params, opt_state, metrics

    return step


def make_gcpg_multistep_resident(
    model: GCPG, optimizer: optax.GradientTransformation,
    condition_gate: Tuple[int, ...], pad_id: int, grad_clip: float = 5.0,
):
    """Device-resident epoch runner (the GCPG twin of
    train/state.py:make_diffusion_multistep_resident): the stacked variant
    corpus (data/dataset.py GCPGSmilesDataset.stacked_variants) lives in
    HBM, and one call scans a whole [K, B] index plan, gathering each batch
    on device with ``jnp.take`` and reconstructing the full-precision batch
    (i16→i32 tokens, i8→f32 mapping, valid = inputs != PAD) in registers.
    Host↔device traffic per call: a few KB of indices in, one stacked
    metrics pytree out — the host-fed loop pays per-step transfers AND a
    per-step blocking loss fetch, which dominate wall clock over a
    tunnelled TPU.

    multistep(params, opt_state, rng, data, idx, beta)
      -> (params, opt_state, metrics [K])
    """
    step = make_gcpg_train_step(model, optimizer, condition_gate, grad_clip)

    def multistep(params, opt_state, rng, data, idx, beta):
        def body(carry, idx_b):
            p, o, key = carry
            take = lambda a: jnp.take(a, idx_b, axis=0)
            inputs = take(data["inputs"]).astype(jnp.int32)
            batch = {
                "inputs": inputs,
                "input_valid": (inputs != pad_id).astype(jnp.float32),
                "targets": take(data["targets"]).astype(jnp.int32),
                "pp_h": take(data["pp_h"]),
                "pp_e": take(data["pp_e"]),
                "pp_mask": take(data["pp_mask"]),
                "mapping": take(data["mapping"]).astype(jnp.float32),
                "props": take(data["props"]),
            }
            key, sub = jax.random.split(key)
            p, o, metrics = step(p, o, sub, batch, beta)
            return (p, o, key), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            body, (params, opt_state, rng), idx
        )
        return params, opt_state, metrics

    return multistep


def gcpg_optimizer(cfg: GCPGTrainConfig, steps_per_epoch: int = 1000):
    """AdamW + CosineAnnealingLR(T_max) (train_chembl33_baseline.py:525-528)."""
    schedule = optax.cosine_decay_schedule(
        cfg.lr, decay_steps=max(cfg.cosine_t_max * steps_per_epoch, 1),
    )
    return optax.adamw(schedule, weight_decay=1e-6)


FINETUNE_GATE = (0, 0, 0, 0, 0, 1, 0)  # score-only (finetune_docking_epoch1.py:154)


def train_gcpg(
    model_cfg,
    train_cfg: GCPGTrainConfig,
    smiles_list,
    properties: Dict,
    out_dir,
    val_smiles=None,
    max_steps=None,
    finetune_from=None,
    log_fn=lambda step, m: None,
    gen_eval_every: int = 0,  # epochs between in-training generation evals
    gen_eval_n: int = 32,
):
    """Full GCPG training loop (train_chembl33_baseline.py __main__ body;
    with ``finetune_from`` + the score-only gate it becomes the docking
    finetune, finetune_docking_epoch1.py)."""
    from pathlib import Path

    import numpy as np

    from cmdgen_tpu.chem.tokenizer import Tokenizer, gen_vocabs
    from cmdgen_tpu.data.dataset import GCPGSmilesDataset
    from cmdgen_tpu.train import checkpoint as ckpt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if finetune_from is not None:
        payload, meta = ckpt.load_checkpoint(finetune_from, "last")
        tokenizer = Tokenizer.from_list(meta["config"]["tokenizer"])
    else:
        tokenizer = Tokenizer(gen_vocabs(smiles_list))

    data = GCPGSmilesDataset(
        smiles_list, properties, tokenizer, max_len=model_cfg.max_len,
        use_random_input_smiles=True, corrupt=True, seed=train_cfg.seed,
        consensus_noise=getattr(train_cfg, "consensus_noise", 0.0),
    )
    model = GCPG(model_cfg, vocab_size=len(tokenizer))

    steps_per_epoch = max(len(data) // train_cfg.batch_size, 1)
    optimizer = gcpg_optimizer(train_cfg, steps_per_epoch)
    step_fn = jax.jit(
        make_gcpg_train_step(
            model, optimizer, train_cfg.condition_gate, train_cfg.grad_clip
        )
    )

    # Device residency: ~bytes of the stacked variant corpus; auto-on below
    # 1.5 GB (HBM is 16 GB; the model + optimizer need a small fraction).
    # max_steps runs (smoke tests) keep the host-fed loop — its step
    # granularity is what max_steps means.
    n_variants = getattr(train_cfg, "resident_variants", 8)
    est_bytes = len(data) * n_variants * (
        model_cfg.max_len * (2 + 2 + 8) + 8 * 8 * 4 * 2 + 8 * 4 + 9 * 4
    )
    resident_mode = getattr(train_cfg, "resident_data", "auto")
    resident = max_steps is None and (
        resident_mode == "on"
        or (resident_mode == "auto" and est_bytes <= (3 << 29))
    )

    rng = jax.random.PRNGKey(train_cfg.seed)
    first = None
    for batch in data.iter_batches(min(train_cfg.batch_size, len(data))):
        first = {k: jnp.asarray(v) for k, v in batch.items()}
        break
    assert first is not None, "no valid training molecules"
    if finetune_from is not None:
        params = payload["params"]
    else:
        rng, k_init = jax.random.split(rng)
        params = model.init(
            k_init, jax.random.PRNGKey(0), first["inputs"],
            first["input_valid"], first["pp_h"], first["pp_e"],
            first["pp_mask"], first["targets"], first["props"][:, COND_IDX],
        )
    opt_state = optimizer.init(params)

    from cmdgen_tpu.data.prefetch import prefetch

    resident_data = None
    if resident:
        stacked = data.stacked_variants(n_variants)
        if stacked is None:
            resident = False
        else:
            resident_data = {k: jnp.asarray(v) for k, v in stacked.items()}
            n_rows = int(stacked["inputs"].shape[0])
            multistep_fn = jax.jit(
                make_gcpg_multistep_resident(
                    model, optimizer, train_cfg.condition_gate,
                    int(tokenizer.PAD), train_cfg.grad_clip,
                )
            )
            idx_rng = np.random.RandomState(train_cfg.seed + 1)

    beta_it = default_beta_schedule(train_cfg)
    step = 0
    for epoch in range(train_cfg.n_epochs):
        beta = next(beta_it)
        if resident:
            idx = idx_rng.randint(
                0, n_rows, size=(steps_per_epoch, train_cfg.batch_size)
            ).astype(np.int32)
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = multistep_fn(
                params, opt_state, sub, resident_data, jnp.asarray(idx),
                jnp.float32(beta),
            )
            step += steps_per_epoch
            losses = np.asarray(metrics["loss"])  # one fetch per epoch
            log_fn(step, {k: float(np.asarray(v)[-1])
                          for k, v in metrics.items()})
            mean_loss = float(np.mean(losses))
        else:
            losses = []
            for batch in prefetch(data.iter_batches(train_cfg.batch_size)):
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                rng, sub = jax.random.split(rng)
                params, opt_state, metrics = step_fn(
                    params, opt_state, sub, jb, beta
                )
                # keep metrics on device: a float() here would block the
                # dispatch pipeline on a device->host sync every step
                losses.append(metrics["loss"])
                step += 1
                if step % 100 == 0:
                    log_fn(step, {k: float(v) for k, v in metrics.items()})
                if max_steps and step >= max_steps:
                    break
            # one stacked fetch, not one device->host RPC per step
            losses = (
                [float(v) for v in np.asarray(jnp.stack(losses))]
                if losses else []
            )
            mean_loss = float(np.mean(losses)) if losses else float("nan")
        log_fn(step, {"epoch": epoch, "beta": beta, "loss/train": mean_loss})
        if gen_eval_every and (epoch + 1) % gen_eval_every == 0:
            # in-training generation quality (train_chembl33_baseline.py:319)
            from cmdgen_tpu.pipeline.evaluate import eval_gcpg

            rng, k_eval = jax.random.split(rng)
            ev = eval_gcpg(
                model, params, tokenizer, k_eval,
                val_smiles or smiles_list, n_molecules=gen_eval_n,
                match_workers=1,
            )
            log_fn(step, {f"gen/{k}": v for k, v in ev.items()
                          if isinstance(v, (int, float))})
        last_epoch = epoch == train_cfg.n_epochs - 1 or (
            max_steps is not None and step >= max_steps
        )
        if epoch % train_cfg.save_freq != 0 and not last_epoch:
            continue
        ckpt.save_checkpoint(
            out_dir, {"params": params, "opt_state": opt_state},
            step=step,
            config={
                "model": _cfg_dict(model_cfg), "train": _cfg_dict(train_cfg),
                "tokenizer": tokenizer.to_list(),
            },
            monitor_value=mean_loss,
        )
        if max_steps and step >= max_steps:
            break
    return params, model, tokenizer


def _cfg_dict(cfg):
    from cmdgen_tpu.config import to_dict

    return to_dict(cfg)
