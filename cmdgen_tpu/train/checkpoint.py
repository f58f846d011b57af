"""Checkpointing with monitor-metric top-k + last semantics.

Equivalent of the reference's persistence: PL ModelCheckpoint
(monitor='loss/val', save_top_k=1, save_last=True; DiffPhar/train.py:101-109)
and GCPG's manual torch.save of model/optimizer/scheduler state
(train_chembl33_baseline.py:601-606). Uses orbax for the pytree payloads and
a JSON sidecar for config + metric bookkeeping.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    ckpt_dir,
    payload: Any,
    step: int,
    config: Optional[Dict] = None,
    monitor_value: Optional[float] = None,
    keep_best: bool = True,
    epoch: Optional[int] = None,
):
    """Save ``last``; also refresh ``best`` when monitor_value improves
    (lower is better, matching loss/val monitoring)."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    cp = _checkpointer()

    def _write(name):
        path = ckpt_dir / name
        if path.exists():
            shutil.rmtree(path)
        cp.save(path.absolute(), payload)
        meta = {"step": int(step)}
        if epoch is not None:
            # epochs completed: the unambiguous resume coordinate (the
            # step<->epoch ratio differs between the resident and host-fed
            # paths, so step-derived epoch skipping can drift)
            meta["epoch"] = int(epoch)
        if monitor_value is not None:
            meta["monitor"] = float(monitor_value)
        if config is not None:
            meta["config"] = config
        (ckpt_dir / f"{name}.json").write_text(json.dumps(meta))

    _write("last")
    if keep_best and monitor_value is not None:
        best_meta = ckpt_dir / "best.json"
        prev = (
            json.loads(best_meta.read_text()).get("monitor", np.inf)
            if best_meta.exists()
            else np.inf
        )
        if monitor_value < prev:
            _write("best")


def load_checkpoint(ckpt_dir, name: str = "last", target: Any = None):
    """Returns (payload, meta dict).

    Without a ``target``, arrays restore as host numpy (platform-neutral):
    orbax otherwise replays the *saved* sharding metadata, which makes a
    TPU-written checkpoint fail to restore in a CPU process and vice versa.
    jax re-places the arrays on the current default device at first use.
    """
    import jax

    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir)
    cp = _checkpointer()
    path = (ckpt_dir / name).absolute()
    if target is None:
        struct = cp.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), struct
        )
        payload = cp.restore(path, restore_args=restore_args)
    else:
        payload = cp.restore(path, item=target)
    meta_path = ckpt_dir / f"{name}.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return payload, meta


def eval_params_from_payload(payload: dict):
    """The evaluation-parameter policy for a restored payload: prefer the
    EMA weights when the checkpoint carries them (the EMA run's validation
    and sampling used them too), else the raw params. Single home for the
    policy — cli/generation/benchmarks must all agree."""
    return payload.get("ema_params") or payload["params"]
