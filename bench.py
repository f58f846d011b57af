"""Headline benchmark: EGNN denoise steps/sec/chip on real TPU hardware.

Measures the hot loop of the whole pipeline — batched reverse-diffusion
sampling of pharmacophore clouds given pockets (one "denoise step" = one
EGNN denoiser evaluation for one sample; a batch of B samples over T scan
steps is B*T denoise steps). Shapes follow the CA-pocket flagship config
(crossdocked_ca_cond.yml: hidden 256, 5 layers, T=500, pocket ~110 CA atoms)
with bf16 compute on the MXU, realistic folded-protein pocket geometry
(shell around the site, CA-CA >= 3.8 Å — the density the 6 Å cutoff
adjacency actually sees in CrossDocked), and the fixed-K neighbor-list
engine (K=12; exact for this geometry, whose in-cutoff neighbor counts max
out at ~11 including self — see benchmarks/egnn_probe.py and PERF.md; rows
with more neighbors keep the K nearest).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the driver-set north star of 50k
denoise steps/sec/chip (BASELINE.json) — the reference itself publishes no
numbers (BASELINE.md).

Env knobs: BENCH_PALLAS=1 (the fused whole-network Pallas neighbor kernel
at BENCH_K; BENCH_SPP sets samples per Pallas program), BENCH_MSGPASS=1
(XLA neighbor engine with the per-GCL Pallas message-pass kernel,
ops/egnn_msgpass.py), BENCH_DENSE=1 (dense [N,N] pair blocks on the XLA
engine instead of the neighbor list; incompatible with BENCH_PALLAS),
BENCH_BATCH, BENCH_K.

Timing fetches the sampled coordinates to host (np.asarray) inside the
timed loop — `block_until_ready` alone does not reliably wait over the
axon tunnel (CLAUDE.md); the [B,Np,3] fetch itself is negligible.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cmdgen_tpu.config import ca_config
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
    from cmdgen_tpu.models.dynamics import EGNNDynamics, make_pallas_apply
    from cmdgen_tpu.utils.synthetic import realistic_ca_pocket

    cfg = ca_config()
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    use_dense = os.environ.get("BENCH_DENSE", "0") == "1"
    b = int(os.environ.get("BENCH_BATCH", "48"))
    k = int(os.environ.get("BENCH_K", "12"))
    egnn = dataclasses.replace(
        cfg.dynamics.egnn,
        compute_dtype=jnp.bfloat16,
        neighbor_k=None if use_dense else k,
        msgpass_pallas=os.environ.get("BENCH_MSGPASS", "0") == "1",
    )
    dyn_cfg = dataclasses.replace(cfg.dynamics, egnn=egnn)
    dynamics = EGNNDynamics(dyn_cfg)
    if use_pallas and use_dense:
        raise SystemExit("BENCH_PALLAS needs the neighbor list; unset BENCH_DENSE")
    spp = int(os.environ.get("BENCH_SPP", "1"))
    apply_fn = (make_pallas_apply(dyn_cfg, samples_per_program=spp)
                if use_pallas else None)
    model = ConditionalDDPM(cfg.ddpm, dynamics, apply_fn=apply_fn)

    n_p, n_q = 8, 110
    # time the FULL T=500 flagship chain: each jitted sample call carries a
    # fixed ~30 ms dispatch+fetch constant over the axon tunnel, so short
    # timed slices inflate the per-step figure (at t_steps=100 the constant
    # alone is 0.3 ms/step ≈ 20% — it masked the round-3 kernel gains;
    # PERF.md round-4 notes). Production sampling runs the full chain, so
    # T=500 is both the honest and the representative measurement.
    t_steps = int(os.environ.get("BENCH_TSTEPS", "500"))
    rng = jax.random.PRNGKey(0)
    k2, k3 = jax.random.split(rng)
    pockets = np.stack(
        [realistic_ca_pocket(np.random.RandomState(i), n_q)
         for i in range(min(b, 8))]
    )
    pockets = np.tile(pockets, (b // len(pockets) + 1, 1, 1))[:b]
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
    # warmup / compile
    out = sample(params, jax.random.PRNGKey(1))
    np.asarray(out[0].x)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = sample(params, jax.random.PRNGKey(2 + i))
        np.asarray(out[0].x)  # host fetch = reliable completion barrier
        times.append(time.perf_counter() - t0)
    dt = min(times)
    steps_per_sec = b * t_steps / dt

    print(
        json.dumps(
            {
                "metric": "egnn_denoise_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 2),
                "unit": "denoise steps/s/chip (CA config: hidden 256, "
                        f"5 layers, N=118, bf16, neighbor-list K={k})",
                "vs_baseline": round(steps_per_sec / 50000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
