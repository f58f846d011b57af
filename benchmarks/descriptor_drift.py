"""Quantify built-in-descriptor drift and its effect on conditioning.

VERDICT r2 weak item 7 / next-round item 8: the GCPG property conditions
(MW, logP, QED, SAS, ...) are computed with the self-contained descriptor
implementations in chem/descriptors.py (no RDKit in this image). Two
questions, answered with numbers:

A. How far are the built-in descriptors from reference-grade values?
   Measured against the golden table used by tests/test_descriptors.py
   (PubChem/RDKit MW + TPSA + XLogP3 for 33 molecules, RDKit sascorer
   anchors for 7).

B. How well does a *trained* GCPG adhere to its conditions, and how does
   the drift shift that adherence for an RDKit-world user?  With
   --gcpg-ckpt, sweeps one condition at a time over a grid, generates
   N molecules per value, and reports the mean built-in descriptor of the
   valid outputs per target. Since the model is trained and conditioned on
   built-in descriptors, its outputs adhere in built-in units; translating
   a reference-world target into built-in units shifts it by at most the
   bias ± spread from table A (the bound recorded in PARITY.md).

Run: python benchmarks/descriptor_drift.py [--gcpg-ckpt DIR] [--n 64]
Prints one JSON line; use --markdown for the PARITY.md table.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))


# RDKit sascorer anchor values (same list as tests/test_descriptors.py)
SA_ANCHORS = [
    ("CC(=O)Oc1ccccc1C(=O)O", 1.58),
    ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 1.60),
    ("CC(=O)Nc1ccc(O)cc1", 1.49),
    ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", 2.28),
    ("c1ccccc1", 1.00),
    ("C1CC2CC1C1C3CC(C1)C23", 5.0),
    ("O=C1CC2OCC=C3CN4CCC5(c6ccccc6N1C25)C34", 6.0),
]


def deviation_table():
    from test_descriptors import GOLDEN

    from cmdgen_tpu.chem import descriptors as d

    rows = {}
    devs = {"MW": [], "TPSA": [], "logP": []}
    for smi, name, mw, tpsa, xlogp in GOLDEN:
        devs["MW"].append(d.mol_weight(smi) - mw)
        devs["TPSA"].append(d.tpsa(smi) - tpsa)
        devs["logP"].append(d.crippen_logp(smi) - xlogp)
    devs["SAS"] = [
        d.sa_score(smi) - ref for smi, ref in SA_ANCHORS
    ]
    for k, v in devs.items():
        v = np.asarray(v)
        rows[k] = {
            "bias": round(float(v.mean()), 3),
            "mean_abs": round(float(np.abs(v).mean()), 3),
            "max_abs": round(float(np.abs(v).max()), 3),
            "n": len(v),
        }
    return rows


# condition vector layout [MW, logP, QED, SAS, RotaNumBonds, Score, Smi]
DEFAULTS = np.asarray([350.0, 3.0, 0.6, 3.0, 4.0, 0.0, 0.0], np.float32)
SWEEPS = {
    "MW": (0, [250.0, 350.0, 450.0]),
    "logP": (1, [1.0, 3.0, 5.0]),
    "QED": (2, [0.4, 0.6, 0.8]),
    "SAS": (3, [2.0, 3.5, 5.0]),
}
MEASURE = {
    "MW": "mol_weight",
    "logP": "crippen_logp",
    "QED": "qed",
    "SAS": "sa_score",
}


def adherence(gcpg_ckpt, n_per_target=64, seed=0, fixture_smiles=None):
    import random as _random

    import jax
    import jax.numpy as jnp

    from cmdgen_tpu.chem import descriptors as d
    from cmdgen_tpu.chem.mol import canonical_smiles
    from cmdgen_tpu.chem.ppgraph import smiles_to_ppgraph
    from cmdgen_tpu.cli import _load_gcpg_ckpt
    from cmdgen_tpu.models import gcpg as gcpg_mod

    model, params, tokenizer = _load_gcpg_ckpt(gcpg_ckpt, "last")
    py_rng = _random.Random(seed)
    if fixture_smiles is None:
        from quality_eval import make_corpus

        fixture_smiles = make_corpus(64, seed=123)
    graphs = []
    for s in fixture_smiles:
        g = smiles_to_ppgraph(s, py_rng)
        if g is not None:
            graphs.append(g[:3])
        if len(graphs) >= n_per_target:
            break
    reps = -(-n_per_target // len(graphs))
    graphs = (graphs * reps)[:n_per_target]
    pp_h = jnp.asarray(np.stack([g[0] for g in graphs]))
    pp_e = jnp.asarray(np.stack([g[1] for g in graphs]))
    pp_mask = jnp.asarray(np.stack([g[2] for g in graphs]))

    rng = jax.random.PRNGKey(seed)
    out = {}
    for key, (ci, values) in SWEEPS.items():
        fn = getattr(d, MEASURE[key])
        per_target = []
        for v in values:
            cond = np.tile(DEFAULTS, (n_per_target, 1))
            cond[:, ci] = v
            rng, sub = jax.random.split(rng)
            toks = gcpg_mod.generate(
                model, params, sub, pp_h, pp_e, pp_mask,
                jnp.asarray(cond), random_sample=True,
            )
            smiles = tokenizer.get_text(np.asarray(toks))
            vals = []
            for s in smiles:
                c = canonical_smiles(s)
                if c:
                    try:
                        vals.append(float(fn(c)))
                    except Exception:
                        pass
            per_target.append({
                "target": v,
                "mean": round(float(np.mean(vals)), 3) if vals else None,
                "std": round(float(np.std(vals)), 3) if vals else None,
                "n_valid": len(vals),
            })
        out[key] = per_target
    return out


def markdown(dev, adh=None):
    lines = [
        "| Descriptor | bias (built-in − ref) | mean abs dev | max abs dev | n |",
        "|---|---|---|---|---|",
    ]
    for k, r in dev.items():
        lines.append(
            f"| {k} | {r['bias']:+.3f} | {r['mean_abs']:.3f} "
            f"| {r['max_abs']:.3f} | {r['n']} |"
        )
    if adh:
        lines += ["", "| Condition | target | output mean ± std (built-in) | n valid |",
                  "|---|---|---|---|"]
        for k, rows in adh.items():
            for r in rows:
                lines.append(
                    f"| {k} | {r['target']} | {r['mean']} ± {r['std']} "
                    f"| {r['n_valid']} |"
                )
    return "\n".join(lines)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gcpg-ckpt", default=None)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    dev = deviation_table()
    adh = adherence(args.gcpg_ckpt, args.n) if args.gcpg_ckpt else None
    if args.markdown:
        print(markdown(dev, adh))
    else:
        print(json.dumps({"deviation": dev, "adherence": adh}))
