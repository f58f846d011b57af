"""Measured HBM floor for the flagship denoise step (VERDICT r4 next-3).

PERF.md's 40-43k steps/s "XLA-path floor" was an *estimate*: ~0.95 GB of
structurally-materialized HBM traffic per batch-step divided by an assumed
~820 GB/s. This probe replaces both factors with measurements:

  A. achievable HBM bandwidth: a jitted lax.scan whose carry is a large
     bf16 array and whose body is one fused read-modify-write pass
     (2 x bytes per step). Sizes beyond VMEM guarantee HBM residency.
     Timed with a host fetch (block_until_ready is unreliable over the
     axon tunnel, CLAUDE.md).
  B. binding-constraint scaling of the REAL sampler step (bench.py
     shapes): per-step time at H in {128, 256} and K in {6, 12}.
     Materialized pair-tensor bytes scale ~linearly in H and K; matmul
     FLOPs scale ~H^2 and ~K. Time tracking bytes (not FLOPs) across both
     axes confirms bandwidth-bound empirically.

Prints one JSON line: measured BW, the implied ceiling at the PERF.md
traffic estimate, the measured step rate, and the scaling ratios.
Run on the real TPU (the bench surface). ~3 min.
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


def _time_call(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + settle
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def measure_bandwidth(mb: int, steps: int = 200) -> float:
    """GB/s of a fused read+write pass over an `mb`-MB bf16 array."""
    n = mb * 1024 * 1024 // 2
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(c, _):
            return c * jnp.bfloat16(1.0001) + jnp.bfloat16(1e-6), ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        # ship only 16 bytes to host: fetching the full carry times the
        # axon TUNNEL (~16 GB/s network), not device HBM — the round-5
        # first run of this probe made exactly that mistake
        return c[:8]

    dt = _time_call(run, x)
    total_bytes = 2.0 * (n * 2) * steps  # read + write per step
    return total_bytes / dt / 1e9


def sampler_step_ms(hidden: int, k: int = 12, b: int = 48,
                    t_steps: int = 200):
    """Per-batch-step ms of the real reverse chain at bench.py geometry."""
    from cmdgen_tpu.config import ca_config
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
    from cmdgen_tpu.models.dynamics import EGNNDynamics
    from cmdgen_tpu.utils.synthetic import realistic_ca_pocket

    cfg = ca_config()
    egnn = dataclasses.replace(
        cfg.dynamics.egnn, compute_dtype=jnp.bfloat16, neighbor_k=k,
        hidden_nf=hidden,
    )
    dyn_cfg = dataclasses.replace(cfg.dynamics, egnn=egnn)
    dynamics = EGNNDynamics(dyn_cfg)
    model = ConditionalDDPM(cfg.ddpm, dynamics)
    n_p, n_q = 8, 110
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
    dt = _time_call(lambda p: sample(p, jax.random.PRNGKey(1)), params)
    return dt / t_steps * 1e3


def main():
    out = {"metric": "hbm_floor_probe"}
    bws = {mb: round(measure_bandwidth(mb), 1) for mb in (64, 128, 256)}
    out["copy_bw_gbs"] = bws
    bw = max(bws.values())
    # PERF.md traffic estimate for the flagship step (H=256, K=12, B=48)
    est_gb = 0.95
    out["implied_ceiling_steps_s"] = round(bw / est_gb * 48, 0)

    ms = {}
    for h, k in ((256, 12), (128, 12), (256, 6), (256, 16)):
        ms[f"h{h}_k{k}"] = round(sampler_step_ms(h, k), 3)
    ms["h256_k12_b24"] = round(sampler_step_ms(256, 12, b=24), 3)
    out["step_ms"] = ms
    out["measured_steps_s_flagship"] = round(48 / ms["h256_k12"] * 1e3, 0)
    # bytes scale ~H and ~K; FLOPs ~H^2 and ~K. ratio near byte-prediction
    # (2x / 2x) => bandwidth-bound; near FLOP-prediction (4x / 2x on the
    # H axis) => compute-bound. The round-5 first run measured H-ratio
    # 1.10 / K-ratio 1.57: the step is dominated by H-independent,
    # K-linear work, NOT the [B,N,K,H] HBM chains. Linear decomposition
    # t = fixed + aK*K + aH*H quantifies the three components; the b=24
    # point separates per-sample work from batch-fixed overhead.
    out["h_scaling_ratio"] = round(ms["h256_k12"] / ms["h128_k12"], 2)
    out["k_scaling_ratio"] = round(ms["h256_k12"] / ms["h256_k6"], 2)
    a_k = (ms["h256_k12"] - ms["h256_k6"]) / 6.0
    a_h = (ms["h256_k12"] - ms["h128_k12"]) / 128.0
    fixed = ms["h256_k12"] - a_k * 12 - a_h * 256
    out["linear_decomposition_ms"] = {
        "fixed": round(fixed, 3), "per_k": round(a_k, 4),
        "per_h": round(a_h, 5),
        "k16_check": round(fixed + a_k * 16 + a_h * 256, 3),
    }
    out["b_scaling_ratio"] = round(ms["h256_k12"] / ms["h256_k12_b24"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
