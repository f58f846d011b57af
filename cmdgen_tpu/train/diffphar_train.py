"""DiffPhar training loop: data-parallel jit train step, eval, checkpoints.

Behavioral equivalent of the PL harness (DiffPhar/train.py +
lightning_modules.py): AdamW(amsgrad) at lr 1e-4, optional adaptive gradient
clipping, periodic validation with loss monitoring, best+last checkpoints,
and eval-epoch sampling metrics (type-histogram KL against the training
distribution). DDP-over-NCCL becomes batch sharding over a dp mesh with XLA
inserting the gradient reduction; eval sampling is batched on device instead
of rank-0-only.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu import config as cfgmod
from cmdgen_tpu.chem.constants import DATASET_PARAMS
from cmdgen_tpu.chem.metrics import categorical_kl
from cmdgen_tpu.containers import PointCloud
from cmdgen_tpu.data.dataset import DiffPharDataset
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
from cmdgen_tpu.diffusion.joint import JointDDPM
from cmdgen_tpu.diffusion.size_prior import SizePrior
from cmdgen_tpu.models.dynamics import EGNNDynamics
from cmdgen_tpu.parallel import mesh as pmesh
from cmdgen_tpu.train import checkpoint as ckpt
from cmdgen_tpu.train import state as tstate


def build_model(cfg: cfgmod.DiffPharConfig,
                size_histogram: Optional[np.ndarray] = None):
    dynamics = EGNNDynamics(cfg.dynamics)
    prior = SizePrior(size_histogram) if size_histogram is not None else None
    if cfg.train.mode == "joint":
        assert cfg.dynamics.update_pocket_coords
        return JointDDPM(cfg.ddpm, dynamics, prior)
    return ConditionalDDPM(cfg.ddpm, dynamics, prior)


def _to_clouds(batch: Dict[str, np.ndarray]):
    phar = PointCloud(
        x=jnp.asarray(batch["phar_x"]),
        h=jnp.asarray(batch["phar_h"]),
        mask=jnp.asarray(batch["phar_mask"]),
    )
    pocket = PointCloud(
        x=jnp.asarray(batch["pocket_x"]),
        h=jnp.asarray(batch["pocket_h"]),
        mask=jnp.asarray(batch["pocket_mask"]),
    )
    return phar, pocket


def init_params(model, rng, batch):
    phar, pocket = _to_clouds(batch)
    params = model.dynamics.init(
        rng, phar.xh, pocket.xh, jnp.zeros((phar.batch, 1)),
        phar.mask, pocket.mask,
    )
    # learned noise schedule: gamma-net params join the same tree
    return model.init_extra_params(jax.random.fold_in(rng, 7), params)


def evaluate(model, params, dataset: DiffPharDataset, rng,
             batch_size: int, max_batches: int = 10,
             loss_fn=None) -> float:
    """Mean validation NLL (vlb assembly, training=False).

    ``loss_fn`` (params, rng, phar, pocket) -> [B] lets the caller pass a
    jitted loss built once per run — eager flax dispatch over the axon
    tunnel costs ~100 ms/call and dominates short validation passes."""
    if loss_fn is None:
        loss_fn = lambda p, r, ph, pk: model.loss(
            p, r, ph, pk, training=False
        )[0]
    losses = []
    np_rng = np.random.RandomState(0)
    for i, batch in enumerate(
        dataset.iter_batches(batch_size, np_rng, shuffle=False, drop_last=False)
    ):
        if i >= max_batches:
            break
        phar, pocket = _to_clouds(batch)
        rng, sub = jax.random.split(rng)
        nll = loss_fn(params, sub, phar, pocket)
        losses.append(float(jnp.mean(nll)))
    return float(np.mean(losses)) if losses else float("nan")


def sampling_metrics(model, params, dataset: DiffPharDataset, rng,
                     n_samples: int = 16, dataset_name: str = "crossdock_full"
                     ) -> Dict[str, float]:
    """Eval-epoch sampling + KL of sampled type histogram vs the training
    histogram (lightning_modules.py:289-382)."""
    params_c = params
    batch = dataset.padded_batch(list(range(min(n_samples, len(dataset)))))
    phar, pocket = _to_clouds(batch)
    nn = jnp.maximum(phar.size.astype(jnp.int32), 1)
    out_phar, _ = model.sample_given_pocket(
        params_c, rng, pocket, nn, dataset.n_phar_max
    )
    h = np.asarray(out_phar.h)
    mask = np.asarray(out_phar.mask) > 0.5
    types = h[mask].argmax(-1)
    hist = np.bincount(types, minlength=h.shape[-1])
    ref_hist = np.asarray(
        list(DATASET_PARAMS[dataset_name]["phar_hist"].values()), dtype=float
    )[: h.shape[-1]]
    # max pairwise spread of each generated cloud (test.py:94-227's spread
    # metric) — the live indicator of reverse-chain coordinate health
    x = np.asarray(out_phar.x)
    spreads = []
    for s in range(x.shape[0]):
        pts = x[s][mask[s]]
        if len(pts) > 1:
            d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
            spreads.append(float(d.max()))
    return {"kl_types": categorical_kl(hist, ref_hist),
            "spread_gen": float(np.mean(spreads)) if spreads else np.nan}


def train_diffphar(
    cfg: cfgmod.DiffPharConfig,
    datadir,
    out_dir,
    max_steps: Optional[int] = None,
    log_fn: Callable[[int, Dict], None] = lambda step, m: None,
    resume_from=None,
):
    """Full training entry (DiffPhar/train.py equivalent).

    ``resume_from``: checkpoint dir whose ``last`` payload (params +
    opt_state + ema_params, written by this trainer) restarts training at
    its recorded step — whole epochs already covered are skipped, and the
    per-epoch RNG stream is fast-forwarded so the resumed run draws fresh
    batches/timesteps rather than replaying epoch 0's."""
    datadir = Path(datadir)
    out_dir = Path(out_dir)
    train_ds = DiffPharDataset(datadir / "train.npz")
    val_ds = DiffPharDataset(datadir / "val.npz")
    size_hist = None
    hist_path = datadir / "size_distribution.npy"
    if hist_path.exists():
        size_hist = np.load(hist_path)

    model = build_model(cfg, size_hist)
    optimizer = tstate.reference_optimizer(cfg.train.lr)
    train_step = tstate.make_diffusion_train_step(
        model, optimizer, clip_grad=cfg.train.clip_grad,
        ema_decay=cfg.train.ema_decay,
    )

    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, k_init = jax.random.split(rng)
    first = train_ds.padded_batch(list(range(min(cfg.train.batch_size, len(train_ds)))))
    params = init_params(model, k_init, first)
    # reference init guard (en_diffusion.py:64-77): the noise floor at t=0
    # must not straddle one normalized one-hot unit
    model.check_norm_values(params)
    state = tstate.init_state(params, optimizer, ema=cfg.train.ema_decay > 0)
    start_step = 0
    if resume_from is not None:
        payload, meta = ckpt.load_checkpoint(Path(resume_from), "last")
        # orbax restores pytrees as plain containers; rebuild the optax
        # NamedTuple state around the restored leaves (same flatten order:
        # alphabetical dict keys == optax field order for adam states)
        ref_leaves, ref_def = jax.tree_util.tree_flatten(state.opt_state)
        opt_leaves = jax.tree_util.tree_leaves(payload["opt_state"])
        if len(opt_leaves) != len(ref_leaves):
            raise ValueError(
                f"resume_from optimizer state has {len(opt_leaves)} leaves, "
                f"expected {len(ref_leaves)} (different optimizer config?)"
            )
        if cfg.train.ema_decay > 0:
            # seed the EMA from the restored params when the checkpoint
            # predates EMA — never from the fresh random init the state
            # was built with
            ema = payload.get("ema_params", payload["params"])
        else:
            # non-EMA run: drop any restored EMA — train_step would never
            # update it, yet eval/checkpointing prefer it when present
            ema = None
        state = dataclasses.replace(
            state,
            params=payload["params"],
            opt_state=jax.tree_util.tree_unflatten(ref_def, opt_leaves),
            ema_params=ema,
            step=jnp.asarray(int(meta["step"]), dtype=jnp.int32),
        )
        start_step = int(meta["step"])
        # epochs completed, when recorded (unambiguous across the
        # resident/host-fed step-accounting difference); older
        # checkpoints fall back to step-derived skipping
        start_epoch = meta.get("epoch")

    mesh = pmesh.make_mesh(dp=cfg.train.dp, tp=cfg.train.tp)
    if cfg.train.fsdp:
        # ZeRO-3: params + optimizer moments sharded over dp; the scalar
        # step (and any indivisible leaves) stay replicated via the
        # fsdp_sharding fallback
        state = pmesh.shard_params_fsdp(state, mesh)
    else:
        state = pmesh.replicate(state, mesh)
    step_fn = jax.jit(train_step, donate_argnums=(0,))
    spc = max(1, cfg.train.steps_per_call)
    n_mesh_devices = int(np.prod(list(mesh.shape.values())))
    resident = cfg.train.resident_data == "on" or (
        cfg.train.resident_data == "auto"
        and spc > 1
        and n_mesh_devices == 1
        and train_ds.nbytes() < 2**30
    )
    if resident:
        data_arrays = jax.device_put(train_ds.stacked_arrays())
        resident_fn = jax.jit(
            tstate.make_diffusion_multistep_resident(
                model, optimizer, clip_grad=cfg.train.clip_grad,
                ema_decay=cfg.train.ema_decay,
            ),
            donate_argnums=(0,),
        )
    elif spc > 1:
        multi_fn = jax.jit(
            tstate.make_diffusion_multistep(
                model, optimizer, clip_grad=cfg.train.clip_grad,
                ema_decay=cfg.train.ema_decay,
            ),
            donate_argnums=(0,),
        )

    np_rng = np.random.RandomState(cfg.train.seed)
    step = 0
    t0 = time.time()
    eval_loss_fn = jax.jit(
        lambda p, r, ph, pk: model.loss(p, r, ph, pk, training=False)[0]
    )
    val_loss = float("nan")
    from cmdgen_tpu.data.prefetch import prefetch

    def _grouped(batches):
        """Yield ('multi', [spc batches]) groups plus a ('single', b) tail
        — every batch in a group shares shapes (global padding)."""
        buf = []
        for b in batches:
            buf.append(b)
            if len(buf) == spc:
                yield "multi", buf
                buf = []
        for b in buf:
            yield "single", [b]

    _bs0 = cfg.train.batch_size
    _nb0 = max(1, len(train_ds) // _bs0)
    _epoch_steps = -(-_nb0 // spc) * spc  # resident path: exact per epoch

    def _cadence_splits(epoch):
        """rng splits the bookkeeping tail of one epoch consumes."""
        n = 0
        if ((epoch + 1) % max(1, cfg.train.val_epochs) == 0
                or (epoch + 1) % max(1, cfg.train.ckpt_epochs) == 0):
            n += 1
        if (cfg.train.eval_epochs
                and (epoch + 1) % cfg.train.eval_epochs == 0
                and hasattr(model, "sample_given_pocket")):
            n += 1
        return n

    with mesh:
        for epoch in range(cfg.train.n_epochs):
            _covered = (
                epoch < start_epoch if start_epoch is not None
                else step + (_epoch_steps if resident else _nb0) <= start_step
            ) if resume_from is not None else False
            if resident and _covered:
                # epoch fully covered by the resumed checkpoint: consume
                # the exact RNG draws it made, run nothing on device
                np_rng.permutation(len(train_ds))
                for _ in range(-(-_nb0 // spc) + _cadence_splits(epoch)):
                    rng, _ = jax.random.split(rng)
                step += _epoch_steps
                continue
            if not resident and _covered:
                # non-resident skip: replay the epoch's batch-order draw
                # (iter_batches consumes exactly one shuffle) so the
                # remaining epochs see the same data schedule a continuous
                # run would; the jax stream advances once per epoch (the
                # host-fed path's split count is shape-dependent — no
                # bit-exact replay promise off the resident path)
                np_rng.shuffle(np.arange(len(train_ds)))
                rng, _ = jax.random.split(rng)
                step += _nb0
                continue
            if resident:
                bs = cfg.train.batch_size
                order = np_rng.permutation(len(train_ds)).astype(np.int32)
                nb = len(order) // bs
                order = order[: nb * bs].reshape(nb, bs)
                for g in range(0, nb, spc):
                    rows = order[g : g + spc]
                    if len(rows) < spc:
                        # wrap-around fill keeps the call shape static
                        rows = np.concatenate(
                            [rows, order[: spc - len(rows)]], axis=0
                        )
                    rng, sub = jax.random.split(rng)
                    state, mstack = resident_fn(
                        state, sub, data_arrays, jnp.asarray(rows)
                    )
                    metrics = jax.tree_util.tree_map(lambda a: a[-1], mstack)
                    step += len(rows)
                    if step % 50 < spc:
                        log_fn(step, {k: float(v) for k, v in metrics.items()})
                    if max_steps and step >= max_steps:
                        break
                it = iter(())  # epoch consumed by the resident path
            else:
                it = prefetch(
                    train_ds.iter_batches(cfg.train.batch_size, np_rng)
                )
            for kind, group in _grouped(it) if spc > 1 else (
                ("single", [b]) for b in it
            ):
                rng, sub = jax.random.split(rng)
                if kind == "multi" and not (
                    max_steps and step + spc > max_steps
                ):
                    clouds = [_to_clouds(b) for b in group]
                    # [M, B, ...] stacks: steps axis leading, batch on dp
                    sb = pmesh.NamedSharding(mesh, pmesh.P(None, "dp"))
                    phar_stack = jax.tree_util.tree_map(
                        lambda *a: jax.device_put(np.stack(a), sb),
                        *[c[0] for c in clouds]
                    )
                    pocket_stack = jax.tree_util.tree_map(
                        lambda *a: jax.device_put(np.stack(a), sb),
                        *[c[1] for c in clouds]
                    )
                    state, mstack = multi_fn(
                        state, sub, phar_stack, pocket_stack
                    )
                    metrics = jax.tree_util.tree_map(lambda a: a[-1], mstack)
                    step += spc
                else:
                    for b in group:
                        phar, pocket = _to_clouds(b)
                        phar = pmesh.shard_batch(phar, mesh)
                        pocket = pmesh.shard_batch(pocket, mesh)
                        rng, sub = jax.random.split(rng)
                        state, metrics = step_fn(state, sub, phar, pocket)
                        step += 1
                        if max_steps and step >= max_steps:
                            break
                if step % 50 < spc:
                    log_fn(step, {k: float(v) for k, v in metrics.items()})
                if max_steps and step >= max_steps:
                    break
            # validation + checkpoint (or when stopping early)
            last = (epoch + 1 == cfg.train.n_epochs) or (
                max_steps and step >= max_steps
            )
            ckpt_now = (epoch + 1) % max(1, cfg.train.ckpt_epochs) == 0 or last
            val_now = (epoch + 1) % max(1, cfg.train.val_epochs) == 0
            if val_now or ckpt_now:
                rng, k_eval = jax.random.split(rng)
                val_loss = evaluate(
                    model, tstate.eval_params(state), val_ds, k_eval,
                    cfg.train.batch_size, loss_fn=eval_loss_fn,
                )
                log_fn(step, {"loss/val": val_loss, "epoch": epoch,
                              "elapsed_s": time.time() - t0})
            if (
                cfg.train.eval_epochs
                and (epoch + 1) % cfg.train.eval_epochs == 0
                and hasattr(model, "sample_given_pocket")
            ):
                # eval-epoch sampling + type-KL (lightning_modules.py:289-382)
                rng, k_samp = jax.random.split(rng)
                sm = sampling_metrics(
                    model, tstate.eval_params(state), val_ds, k_samp,
                    n_samples=min(cfg.train.n_eval_samples, 16),
                    dataset_name=cfg.data.dataset,
                )
                log_fn(step, {f"sampling/{k}": v for k, v in sm.items()})
            if ckpt_now:
                payload = {"params": state.params,
                           "opt_state": state.opt_state}
                if state.ema_params is not None:
                    payload["ema_params"] = state.ema_params
                ckpt.save_checkpoint(
                    out_dir, payload,
                    step=step, config=cfgmod.to_dict(cfg),
                    monitor_value=val_loss, epoch=epoch + 1,
                )
            if max_steps and step >= max_steps:
                break
    return state, model
