"""One typed configuration tree for every pipeline stage.

Replaces the reference's three ad-hoc config styles — YAML-merged argparse
Namespaces (DiffPhar/train.py:17-41), class-attribute CFG blobs
(GCPG/train_chembl33_baseline.py:50-114), and bare argparse inference CLIs —
with dataclasses that serialize to/from plain dicts (and therefore YAML and
checkpoints). Field names and defaults track the reference configs
(DiffPhar/configs/crossdocked_full_cond.yml / crossdocked_ca_cond.yml).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from cmdgen_tpu.diffusion.cddpm import DDPMConfig
from cmdgen_tpu.models.dynamics import DynamicsConfig
from cmdgen_tpu.models.egnn import EGNNConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "crossdock_full"      # 'crossdock_full' | 'crossdock'
    datadir: str = "data/processed"
    pocket_representation: str = "full-atom"  # 'full-atom' | 'CA'
    n_phar_max: int = 16
    n_pocket_max: int = 512


@dataclasses.dataclass(frozen=True)
class DiffPharTrainConfig:
    run_name: str = "crossdocked_full_cond"
    mode: str = "pocket_conditioning"  # 'joint' | 'pocket_conditioning' | 'simple'
    batch_size: int = 8
    lr: float = 1e-4
    n_epochs: int = 100
    clip_grad: bool = False
    eval_epochs: int = 25
    # run validation every N epochs (always on checkpoint epochs and the
    # final epoch); >1 keeps many-thousand-epoch runs from being dominated
    # by per-epoch validation dispatch
    val_epochs: int = 1
    n_eval_samples: int = 100
    seed: int = 0
    dp: Optional[int] = None  # data-parallel size; None = all devices
    tp: int = 1
    # ZeRO-3-style FSDP: shard params + optimizer state over dp (GSPMD
    # all-gathers at use, reduce-scatters grads); False = replicate
    fsdp: bool = False
    # update steps fused under one lax.scan per device call; >1 amortizes
    # the per-call dispatch latency (essential over the tunnelled TPU —
    # ~30-150 ms/call vs ~1 ms of device math; see train/state.py)
    steps_per_call: int = 1
    # checkpoint every N epochs (validation still runs every epoch); the
    # orbax save is seconds of wall per epoch on short epochs
    ckpt_epochs: int = 1
    # EMA of params for sampling/eval (0 = off, reference behavior). The
    # raw params keep training; samplers read the EMA copy.
    ema_decay: float = 0.0
    # device-resident dataset: keep the whole padded corpus in HBM and
    # gather batches on device inside the multistep scan ('auto' = on when
    # the corpus is < 1 GiB, steps_per_call > 1 and dp*tp == 1)
    resident_data: str = "auto"  # 'auto' | 'on' | 'off'


@dataclasses.dataclass(frozen=True)
class DiffPharConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    dynamics: DynamicsConfig = dataclasses.field(default_factory=DynamicsConfig)
    ddpm: DDPMConfig = dataclasses.field(default_factory=DDPMConfig)
    train: DiffPharTrainConfig = dataclasses.field(
        default_factory=DiffPharTrainConfig
    )


def full_atom_config() -> DiffPharConfig:
    """crossdocked_full_cond.yml equivalents (full-atom pocket, 11 classes)."""
    return DiffPharConfig(
        data=DataConfig(dataset="crossdock_full", pocket_representation="full-atom"),
        dynamics=DynamicsConfig(
            phar_nf=8,
            residue_nf=11,
            joint_nf=32,
            edge_cutoff=6.0,
            update_pocket_coords=False,
            egnn=EGNNConfig(
                hidden_nf=256,
                n_layers=3,
                inv_sublayers=1,
                attention=True,
                tanh=True,
                norm_constant=1.0,
                normalization_factor=100.0,
                aggregation_method="sum",
            ),
        ),
        ddpm=DDPMConfig(
            timesteps=100,
            noise_schedule="polynomial_2",
            noise_precision=1e-5,
            loss_type="l2",
            norm_x=1.0,
            norm_h=4.0,
        ),
        train=DiffPharTrainConfig(
            run_name="crossdocked_full_cond", batch_size=8, lr=1e-4,
            n_epochs=100, clip_grad=False,
        ),
    )


def ca_config() -> DiffPharConfig:
    """crossdocked_ca_cond.yml equivalents (CA pocket, 20 AA classes)."""
    base = full_atom_config()
    return dataclasses.replace(
        base,
        data=DataConfig(dataset="crossdock", pocket_representation="CA",
                        n_pocket_max=256),
        dynamics=dataclasses.replace(
            base.dynamics,
            residue_nf=20,
            egnn=dataclasses.replace(base.dynamics.egnn, n_layers=5),
        ),
        ddpm=dataclasses.replace(base.ddpm, timesteps=500),
        train=dataclasses.replace(
            base.train, run_name="crossdocked_ca_cond", batch_size=4,
            n_epochs=1000, clip_grad=True,
        ),
    )


# --------------------------------------------------------------------- GCPG


@dataclasses.dataclass(frozen=True)
class GCPGModelConfig:
    """Mirrors MODEL_DEFAULT_SETTINGS (GCPG/train_chembl33_baseline.py:50-65)."""

    max_len: int = 128
    pp_v_dim: int = 8          # 7 type bits + 1 size scalar
    pp_e_dim: int = 1          # bond-path distance
    pp_encoder_n_layer: int = 4
    hidden_dim: int = 384
    n_layers: int = 8
    ff_dim: int = 1024
    n_head: int = 8
    cond_dim: int = 7          # [MW, logP, QED, SAS, RotaNumBonds, Score, Smi]
    non_vae: bool = False
    remove_pp_dis: bool = False
    n_pp_max: int = 8          # MAX_NUM_PP_GRAPHS
    dropout: float = 0.1
    # Replicate the reference's condition-token masking bug (gcpg.py:208-210
    # marks the cond token as padding in every attention mask, so properties
    # never influence generation). Off in production — documented deviation,
    # PARITY.md — but switchable so the transplant parity suite can compare
    # the full forward against the reference's actual numerics.
    mask_cond_token: bool = False


@dataclasses.dataclass(frozen=True)
class GCPGTrainConfig:
    batch_size: int = 128
    n_epochs: int = 32
    lr: float = 3e-4
    grad_clip: float = 5.0
    kl_beta_min: float = 3e-4
    kl_beta_max: float = 1e-2
    cosine_t_max: int = 4
    # condition gate over the 7 scalars; baseline trains with the first 5 on
    # (train_chembl33_baseline.py:151-157); docking finetune flips to
    # score-only (finetune_docking_epoch1.py:154)
    condition_gate: Tuple[int, ...] = (1, 1, 1, 1, 1, 0, 0)
    save_freq: int = 4  # checkpoint every N epochs (train_chembl33_baseline.py:601)
    seed: int = 42
    # device-resident dataset mode (mirrors DiffPharTrainConfig.resident_data):
    # precompute `resident_variants` augmentation draws per molecule
    # (randomized SMILES + span corruption + SUS pp-graph sampling), stack
    # them compactly in HBM, and run each epoch as one on-device scan with
    # jnp.take batch gather — one host fetch per epoch instead of per step
    # (the host-fed loop is transfer/latency-bound over a tunnelled TPU).
    resident_data: str = "auto"  # 'auto' | 'on' | 'off'
    resident_variants: int = 8
    # fraction of training items whose pp-graph is re-drawn CONSENSUS-STYLE
    # (data/dataset.py:consensus_style_graph): node sizes resampled from
    # the decode-time type-size prior and edge distances jittered with the
    # edis2sdis geometric-error model. Decode-time hypotheses (GMM
    # consensus of diffused clouds -> chem/posp.points_to_graph) carry
    # prior-drawn sizes and noisy linearly-mapped Euclidean distances; the
    # reference only ever trains on exact bond-path graphs, which is why
    # validity collapses out-of-distribution (0.95 in-dist vs 0.80-0.86 on
    # consensus hypotheses, rounds 4-5). Domain randomization closes that
    # train/serve gap.
    consensus_noise: float = 0.0


def _to_dict(obj) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    # dtypes and other non-JSON leaves serialize by name
    return str(getattr(obj, "__name__", obj))


def to_dict(cfg) -> Dict[str, Any]:
    """Serialize any config dataclass to plain nested dicts (for YAML /
    checkpoint metadata, mirroring save_hyperparameters semantics)."""
    return _to_dict(cfg)


def from_dict(cls, d: Dict[str, Any]):
    """Inverse of to_dict for a given dataclass type (recursive)."""
    import typing

    if not dataclasses.is_dataclass(cls):
        return d
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[f.name] = from_dict(ftype, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
