"""GCPG training: loss assembly, KL annealing, condition gating, train step.

Behavioral equivalent of GCPG/train_chembl33_baseline.py (and the
docking-score finetune variant, finetune_docking_epoch1.py): total loss =
LM + beta * KL + weighted mapping BCE, with the 3-phase log/linear KL-beta
annealer, the per-type rarity weights for the mapping head, the
[1,1,1,1,1,0,0] condition gate (score-only [0,0,0,0,0,1,0] for finetuning),
AdamW + cosine LR, and grad-norm clipping at 5.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmdgen_tpu.config import GCPGTrainConfig
from cmdgen_tpu.models.gcpg import GCPG

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
            conds = batch["props"][:, :7] * gate[None, :]
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


def gcpg_optimizer(cfg: GCPGTrainConfig, steps_per_epoch: int = 1000):
    """AdamW + CosineAnnealingLR(T_max) (train_chembl33_baseline.py:525-528)."""
    schedule = optax.cosine_decay_schedule(
        cfg.lr, decay_steps=max(cfg.cosine_t_max * steps_per_epoch, 1),
    )
    return optax.adamw(schedule, weight_decay=1e-6)


FINETUNE_GATE = (0, 0, 0, 0, 0, 1, 0)  # score-only (finetune_docking_epoch1.py:154)
