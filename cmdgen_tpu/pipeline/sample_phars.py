"""Pocket-conditioned pharmacophore sampling (inference stage 1).

Behavioral equivalent of PharPocketDDPM.generate_phars + generate_phars.py
(DiffPhar/lightning_modules.py:385-541, generate_phars.py:10-66): parse a
pocket from PDB (explicit residue list or ≤8 Å around a reference ligand),
tile it across the sample batch, sample pharmacophore point clouds with the
conditional DDPM, shift back into the original pocket frame, and emit the
{Molecule_i: {family: [xyz, ...]}} point-cloud dict consumed by the
consensus stage.
"""
from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem import pdb as pdbmod
from cmdgen_tpu.chem.constants import PHAR_DECODER
from cmdgen_tpu.containers import PointCloud, mask_from_sizes
from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
from cmdgen_tpu.ops.masked import masked_mean


def pocket_point_cloud(
    pdb_file,
    dataset: str,
    representation: str,
    ref_ligand: Optional[str] = None,
    resi_list: Optional[Sequence[str]] = None,
    cutoff: float = 8.0,
):
    """Parse + featurize a pocket -> (coords [N,3], one_hot [N,F])."""
    residues = pdbmod.parse_pdb(pdb_file)
    if resi_list:
        pocket = pdbmod.pocket_by_ids(residues, resi_list)
    elif ref_ligand:
        lig = pdbmod.ligand_atoms(residues, ref_ligand)
        lig_coords = np.stack([a.coord for a in lig])
        pocket = pdbmod.pocket_from_ligand(residues, lig_coords, cutoff)
    else:
        raise ValueError("need ref_ligand or resi_list")
    if not pocket:
        raise ValueError("empty pocket")
    return pdbmod.featurize_pocket(pocket, representation, dataset)


@functools.partial(
    jax.jit, static_argnames=("model", "n_phar_max", "timesteps")
)
def _sample_jit(model, params, rng, pocket, num_nodes, n_phar_max,
                timesteps):
    """Jitted reverse chain (eagerly, the pre/post CoM bookkeeping around
    the scan dispatches op-by-op and launch latency dominates)."""
    return model.sample_given_pocket(
        params, rng, pocket, num_nodes, n_phar_max, timesteps=timesteps
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "resamplings", "jump_length", "timesteps"),
)
def _inpaint_jit(model, params, rng, phar_init, pocket, phar_fixed,
                 pocket_fixed, resamplings, jump_length, timesteps):
    return model.inpaint(
        params, rng, phar_init, pocket,
        phar_fixed=phar_fixed, pocket_fixed=pocket_fixed,
        resamplings=resamplings, jump_length=jump_length,
        timesteps=timesteps,
    )


def sample_pharmacophores(
    model: ConditionalDDPM,
    params,
    rng: jax.Array,
    pocket_coords: np.ndarray,
    pocket_onehot: np.ndarray,
    n_samples: int,
    num_nodes: Optional[np.ndarray] = None,
    n_phar_max: int = 16,
    batch_size: int = 64,
    timesteps: Optional[int] = None,
    pocket_pad_bucket: Optional[int] = None,
) -> Dict[str, Dict[str, List[List[float]]]]:
    """Sample n_samples pharmacophore clouds for one pocket.

    Returns the JSON-ready dict. The pocket is tiled across the batch
    (lightning_modules.py:455-458); sampled coordinates are shifted back by
    the pocket-CoM displacement (497-504).

    ``pocket_pad_bucket``: pad the pocket node axis up to a multiple of
    this granularity (mask-exact: every reduction in the model ignores
    padding). Without it, every distinct pocket size is a fresh jit shape
    — a multi-second remote XLA compile per pocket over the axon tunnel
    was the measured stage-1 bottleneck of the streaming pipeline
    (~19 s/pocket vs ~1 s device time, runs/e2e_r5_grid.log); bucketing
    also stops small pockets paying max-size pair traffic (PERF.md
    route item 2).
    """
    nq, nf = pocket_onehot.shape
    nq_real = nq
    if pocket_pad_bucket:
        nq = -(-nq // pocket_pad_bucket) * pocket_pad_bucket
        pad = nq - nq_real
        if pad:
            pocket_coords = np.concatenate(
                [pocket_coords, np.zeros((pad, 3), pocket_coords.dtype)]
            )
            pocket_onehot = np.concatenate(
                [pocket_onehot, np.zeros((pad, nf), pocket_onehot.dtype)]
            )
    pocket_mask_row = jnp.asarray(
        (np.arange(nq) < nq_real).astype(np.float32)
    )
    out: Dict[str, Dict[str, List[List[float]]]] = {}
    pocket_com_before = pocket_coords[:nq_real].mean(axis=0)
    joint_mode = not hasattr(model, "sample_given_pocket")

    done = 0
    while done < n_samples:
        b = min(batch_size, n_samples - done)
        rng, k_size, k_samp = jax.random.split(rng, 3)
        pocket = PointCloud(
            x=jnp.broadcast_to(jnp.asarray(pocket_coords), (b, nq, 3)),
            h=jnp.broadcast_to(jnp.asarray(pocket_onehot), (b, nq, nf)),
            mask=jnp.broadcast_to(pocket_mask_row, (b, nq)),
        )
        if num_nodes is None:
            if model.size_prior is None:
                nn = jnp.full((b,), 5)
            else:
                nn = model.size_prior.sample_conditional_n1(
                    k_size, jnp.full((b,), nq_real)
                )
            nn = jnp.clip(nn, 1, n_phar_max)
        else:
            nn = jnp.asarray(num_nodes[done : done + b])
        if joint_mode:
            # joint model: generate by RePaint inpainting with the pocket
            # fixed (lightning_modules.py:466-486)
            phar_init = PointCloud(
                x=jnp.zeros((b, n_phar_max, 3)),
                h=jnp.zeros((b, n_phar_max, model.phar_nf)),
                mask=mask_from_sizes(nn, n_phar_max),
            )
            phar, pocket_out = _inpaint_jit(
                model, params, k_samp, phar_init, pocket,
                jnp.zeros_like(phar_init.mask),
                jnp.ones_like(pocket.mask),
                resamplings=1, jump_length=1, timesteps=timesteps,
            )
        else:
            phar, pocket_out = _sample_jit(
                model, params, k_samp, pocket, nn, n_phar_max, timesteps
            )
        # translate back into the original pocket frame
        pocket_com_after = np.asarray(
            masked_mean(pocket_out.x, pocket_out.mask)
        )
        shift = pocket_com_before[None, :] - pocket_com_after  # [b, 3]
        x = np.asarray(phar.x) + shift[:, None, :]
        h = np.asarray(phar.h)
        mask = np.asarray(phar.mask)
        for i in range(b):
            mol: Dict[str, List[List[float]]] = {}
            for j in range(x.shape[1]):
                if mask[i, j] < 0.5:
                    continue
                fam = PHAR_DECODER[int(np.argmax(h[i, j]))]
                mol.setdefault(fam, []).append(
                    [round(float(v), 4) for v in x[i, j]]
                )
            out[f"Molecule_{done + i}"] = mol
        done += b
    return out


def sample_phars_to_json(
    model,
    params,
    rng,
    pdb_file,
    out_json,
    dataset: str = "crossdock_full",
    representation: str = "full-atom",
    ref_ligand: Optional[str] = None,
    resi_list: Optional[Sequence[str]] = None,
    n_samples: int = 100,
    **kwargs,
):
    """End-to-end stage-1 CLI body (generate_phars.py:10-66)."""
    coords, onehot = pocket_point_cloud(
        pdb_file, dataset, representation, ref_ligand, resi_list
    )
    result = sample_pharmacophores(
        model, params, rng, coords, onehot, n_samples, **kwargs
    )
    Path(out_json).write_text(json.dumps(result))
    return result
