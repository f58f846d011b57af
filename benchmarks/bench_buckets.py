"""N_pad bucket probe (PERF.md route item 2 / VERDICT r4 next-3).

The production sampler pads every pocket to one global N (the corpus max);
pair-tensor HBM traffic scales ~linearly in N, so small pockets pay for
padding they don't use. This probe measures the real reverse chain at
several pocket pads and converts the per-bucket rates into corpus-weighted
sampling throughput for the qrun_aa aa-typed corpus (sizes 90-127, median
107) under (a) one global pad and (b) buckets {96, 112, 128}.

Prints one JSON line. Run on the real TPU. ~4 min (one compile per pad).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def sampler_rate(n_q: int, b: int = 48, t_steps: int = 200) -> float:
    """Batch-samples/s of the full reverse chain at pocket pad n_q."""
    from cmdgen_tpu.config import ca_config
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
    from cmdgen_tpu.models.dynamics import EGNNDynamics
    from cmdgen_tpu.utils.synthetic import realistic_ca_pocket

    cfg = ca_config()
    egnn = dataclasses.replace(
        cfg.dynamics.egnn, compute_dtype=jnp.bfloat16, neighbor_k=12
    )
    dyn_cfg = dataclasses.replace(cfg.dynamics, egnn=egnn)
    dynamics = EGNNDynamics(dyn_cfg)
    model = ConditionalDDPM(cfg.ddpm, dynamics)
    n_p = 8
    rng = jax.random.PRNGKey(0)
    k2, k3 = jax.random.split(rng)
    pockets = np.stack(
        [realistic_ca_pocket(np.random.RandomState(i), n_q)
         for i in range(8)]
    )
    pockets = np.tile(pockets, (b // 8 + 1, 1, 1))[:b]
    pocket = PointCloud(
        x=jnp.asarray(pockets),
        h=jax.nn.one_hot(
            jax.random.randint(k2, (b, n_q), 0, dyn_cfg.residue_nf),
            dyn_cfg.residue_nf,
        ),
        mask=mask_from_sizes(jnp.full((b,), n_q), n_q),
    )
    params = dynamics.init(
        k3,
        jnp.zeros((b, n_p, 3 + dyn_cfg.phar_nf)),
        pocket.xh,
        jnp.zeros((b, 1)),
        jnp.ones((b, n_p)),
        pocket.mask,
    )
    num_nodes = jnp.full((b,), n_p)
    sample = jax.jit(
        lambda params, rng: model.sample_given_pocket(
            params, rng, pocket, num_nodes, n_p, timesteps=t_steps
        )
    )
    out = sample(params, jax.random.PRNGKey(1))
    np.asarray(out[0].x)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = sample(params, jax.random.PRNGKey(2 + i))
        np.asarray(out[0].x)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return b * t_steps / dt  # denoise steps/s at this pad


def main():
    # corpus pocket-size distribution (qrun_aa aa-typed test split)
    sizes_path = pathlib.Path("runs/qrun_aa/data/test.npz")
    if sizes_path.exists():
        d = np.load(sizes_path, allow_pickle=True)
        _, counts = np.unique(d["pocket_mask"], return_counts=True)
    else:  # fall back to the measured distribution shape
        rng = np.random.default_rng(0)
        counts = rng.integers(90, 128, size=150)
    pads = [96, 112, 128]
    rates = {}
    for n_q in sorted({*pads}):
        rates[n_q] = sampler_rate(n_q)
    # per-pocket cost model: a pocket of size s runs at the rate of its
    # bucket (steps/s measured at that pad); global pad = max bucket
    def weighted_steps_s(bucket_of):
        # average over pockets of the per-step cost => effective steps/s
        per_pocket_cost = [1.0 / rates[bucket_of(s)] for s in counts]
        return len(counts) / sum(per_pocket_cost)

    glob = weighted_steps_s(lambda s: 128)
    buck = weighted_steps_s(
        lambda s: next(p for p in pads if s <= p))
    out = {
        "metric": "npad_bucket_probe",
        "steps_s_at_pad": {str(k): round(v, 0) for k, v in rates.items()},
        "corpus_weighted_steps_s_global_pad128": round(glob, 0),
        "corpus_weighted_steps_s_buckets": round(buck, 0),
        "bucket_speedup": round(buck / glob, 3),
        "note": "bench.py headline is the fixed N=118 flagship shape; "
                "this probe quantifies the pad-bucketing lever on the "
                "corpus size mix (sizes 90-127)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
