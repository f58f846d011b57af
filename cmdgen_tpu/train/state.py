"""Train state and the adaptive gradient-clipping used by the reference.

The reference clips gradients at mean + 1.5*std of the last 50 gradient
norms, seeded with a large initial value (DiffPhar/lightning_modules.py:
543-568 + utils.py:12-29 Queue). Rebuilt as a pure functional ring buffer
inside the train state so the whole update stays inside one jit.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

GRAD_QUEUE_LEN = 50
GRAD_QUEUE_INIT = 3000.0  # reference seeds the queue with 3000 (lightning_modules.py:49)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    grad_norms: jnp.ndarray  # [GRAD_QUEUE_LEN] ring buffer of recent norms
    ema_params: Optional[Any] = None


def init_state(params, optimizer: optax.GradientTransformation,
               ema: bool = False) -> TrainState:
    queue = jnp.full((GRAD_QUEUE_LEN,), GRAD_QUEUE_INIT, dtype=jnp.float32)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
        grad_norms=queue,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def global_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)


def adaptive_clip(grads, grad_norms: jnp.ndarray):
    """Clip grads to mean + 1.5*std of the recent-norm queue.

    Returns (clipped_grads, new_queue, raw_norm).
    """
    norm = global_norm(grads)
    max_norm = jnp.mean(grad_norms) + 1.5 * jnp.std(grad_norms)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-12))
    grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    # queue records the clipped norm, like PL's gradient_clip_val behavior
    new_queue = jnp.concatenate(
        [grad_norms[1:], jnp.minimum(norm, max_norm)[None]]
    )
    return grads, new_queue, norm


def ema_update(ema_params, params, step, decay: float):
    """Polyak averaging with the standard warmup ramp: the effective decay
    is min(decay, (1+step)/(10+step)) so early EMA tracks the raw params
    instead of the random init (samplers read the EMA copy — diffusion
    sample quality is measurably smoother under it)."""
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d), ema_params, params
    )


def make_diffusion_train_step(model, optimizer: optax.GradientTransformation,
                              clip_grad: bool = True,
                              ema_decay: float = 0.0):
    """Build the jittable train step for the conditional DDPM.

    step(state, rng, phar, pocket) -> (state, metrics)
    """

    def step(state: TrainState, rng, phar, pocket):
        def loss_fn(params):
            nll, info = model.loss(params, rng, phar, pocket, training=True)
            return jnp.mean(nll), info

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if clip_grad:
            grads, queue, raw_norm = adaptive_clip(grads, state.grad_norms)
        else:
            queue, raw_norm = state.grad_norms, global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay > 0.0:
            ema = ema_update(ema, params, state.step, ema_decay)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            grad_norms=queue,
            ema_params=ema,
        )
        metrics = dict(info, loss=loss, grad_norm=raw_norm)
        return new_state, metrics

    return step


def eval_params(state: TrainState):
    """Parameters to sample/evaluate with: the EMA copy when kept."""
    return state.ema_params if state.ema_params is not None else state.params


def make_diffusion_multistep(model, optimizer: optax.GradientTransformation,
                             clip_grad: bool = True,
                             ema_decay: float = 0.0):
    """Multi-step train driver: runs M update steps under ONE lax.scan so a
    training loop pays per-call dispatch latency once per M steps instead
    of per step. On this image the axon-tunnelled TPU costs ~30-150 ms per
    host round trip against ~1 ms of device math per step — single-step
    loops are latency-bound by two orders of magnitude.

    multistep(state, rng, phar_stack, pocket_stack) -> (state, metrics)
    where the stacks carry a leading steps axis ([M, B, N, ...]; every
    slice must share shapes) and metrics are per-step stacked [M].
    Identical update math to M calls of make_diffusion_train_step with the
    same per-step rng splits (tested).
    """
    step = make_diffusion_train_step(model, optimizer, clip_grad, ema_decay)

    def multistep(state: TrainState, rng, phar_stack, pocket_stack):
        def body(carry, xs):
            st, key = carry
            phar, pocket = xs
            key, sub = jax.random.split(key)
            st, metrics = step(st, sub, phar, pocket)
            return (st, key), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), (phar_stack, pocket_stack)
        )
        return state, metrics

    return multistep


def make_diffusion_multistep_resident(
    model, optimizer: optax.GradientTransformation,
    clip_grad: bool = True, ema_decay: float = 0.0,
):
    """Device-resident variant of make_diffusion_multistep: the globally
    padded dataset lives in HBM (DiffPharDataset.stacked_arrays, put once)
    and each scan step gathers its batch on device from an [M, B] index
    array. Per-call host→device transfer drops from ~MB of one-hot batches
    to a few KB of indices — the multistep host path measured ~220 ms/step
    on the tunnelled TPU with transfer dominating (PERF.md round 3).

    multistep(state, rng, data, idx) -> (state, metrics)
      data: dict of stacked arrays (phar_x/h/mask, pocket_x/h/mask)
      idx:  [M, B] int32 rows, one batch per scan step
    """
    from cmdgen_tpu.containers import PointCloud

    step = make_diffusion_train_step(model, optimizer, clip_grad, ema_decay)

    def multistep(state: TrainState, rng, data, idx):
        def body(carry, idx_m):
            st, key = carry
            take = lambda a: jnp.take(a, idx_m, axis=0)
            phar = PointCloud(
                x=take(data["phar_x"]), h=take(data["phar_h"]),
                mask=take(data["phar_mask"]),
            )
            pocket = PointCloud(
                x=take(data["pocket_x"]), h=take(data["pocket_h"]),
                mask=take(data["pocket_mask"]),
            )
            key, sub = jax.random.split(key)
            st, metrics = step(st, sub, phar, pocket)
            return (st, key), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), idx)
        return state, metrics

    return multistep


def reference_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    """AdamW(amsgrad, wd=1e-12) equivalent (lightning_modules.py:141-143)."""
    return optax.chain(
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(1e-12),
        optax.scale_by_learning_rate(lr),
    )
