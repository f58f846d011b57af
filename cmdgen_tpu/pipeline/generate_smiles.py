"""Pharmacophore-conditioned SMILES generation (inference stage 3).

Behavioral equivalent of GCPG/generate.py:17-147 (+ generate_docked.py):
load a ``.posp``/``.edgep`` hypothesis, tile it across the batch, sweep the
property-condition grid, run the batched KV-cached decode, and write the
(optionally canonicalized + deduplicated) SMILES list.
"""
from __future__ import annotations

import itertools
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cmdgen_tpu.chem.mol import canonical_smiles
from cmdgen_tpu.chem.posp import load_phar_file
from cmdgen_tpu.chem.tokenizer import Tokenizer, syntax_tables
from cmdgen_tpu.models import gcpg as gcpg_mod
from cmdgen_tpu.models.gcpg import GCPG

# default condition grid (generate.py:93-99); generate_docked.py uses
# Score=-14 instead of 0
DEFAULT_CONDITIONS = {
    "MW": [400.0],
    "logP": [4.0],
    "QED": [0.6],
    "SAS": [4.0],
    "RotaNumBonds": [4.0],
    "Score": [0.0],
    "Smi": [0.0],
}
CONDITION_ORDER = ["MW", "logP", "QED", "SAS", "RotaNumBonds", "Score", "Smi"]


def condition_grid(overrides: Optional[Dict[str, Sequence[float]]] = None):
    """Cartesian sweep over per-condition value lists -> [G, 7] array."""
    spec = dict(DEFAULT_CONDITIONS)
    if overrides:
        spec.update({k: list(v) for k, v in overrides.items()})
    values = [spec[k] for k in CONDITION_ORDER]
    return np.asarray(list(itertools.product(*values)), dtype=np.float32)


def generate_from_phar(
    model: GCPG,
    params,
    tokenizer: Tokenizer,
    rng: jax.Array,
    phar_file,
    n_per_condition: int = 128,
    conditions: Optional[Dict[str, Sequence[float]]] = None,
    random_sample: bool = True,
    filter_valid: bool = True,
    batch_size: int = 128,
    temperature: float = 1.0,
    constrain: bool = False,
    constrain_valence: bool = False,
) -> List[str]:
    """Returns generated SMILES strings (canonical + deduped if filtered).

    ``constrain`` enables syntax-constrained decoding (see
    ``models.gcpg.generate``): ring/paren-unclosable and special tokens
    are masked during sampling. ``constrain_valence`` additionally masks
    valence-overflow continuations (implies the tables)."""
    pp_h, pp_e, pp_mask = load_phar_file(phar_file)
    grid = condition_grid(conditions)
    tables = (
        jnp.asarray(syntax_tables(tokenizer))
        if constrain or constrain_valence else None
    )
    out: List[str] = []
    for cond in grid:
        remaining = n_per_condition
        while remaining > 0:
            b = min(batch_size, remaining)
            rng, sub = jax.random.split(rng)
            toks = gcpg_mod.generate(
                model,
                params,
                sub,
                jnp.broadcast_to(jnp.asarray(pp_h), (b, *pp_h.shape)),
                jnp.broadcast_to(jnp.asarray(pp_e), (b, *pp_e.shape)),
                jnp.broadcast_to(jnp.asarray(pp_mask), (b, *pp_mask.shape)),
                jnp.broadcast_to(jnp.asarray(cond), (b, len(cond))),
                random_sample=random_sample,
                temperature=temperature,
                constraints=tables,
                valence=constrain_valence,
            )
            out.extend(tokenizer.get_text(np.asarray(toks)))
            remaining -= b
    if filter_valid:
        canon = [canonical_smiles(s) for s in out]
        out = list(dict.fromkeys(c for c in canon if c))
    return out


def generate_to_file(
    model, params, tokenizer, rng, phar_file, out_dir, **kwargs
) -> Path:
    """CLI body: writes ``{stem}_result.txt`` (generate.py:139-147)."""
    phar_file = Path(phar_file)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    smiles = generate_from_phar(
        model, params, tokenizer, rng, phar_file, **kwargs
    )
    out_path = out_dir / f"{phar_file.stem}_result.txt"
    out_path.write_text("\n".join(smiles) + ("\n" if smiles else ""))
    return out_path
