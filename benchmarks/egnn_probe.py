"""Probe: EGNN denoise-sampling throughput — dense vs neighbor-list modes.

Times the same reverse-chain sampling loop as bench.py across engine modes,
neighbor widths K, and batch sizes, on realistic CA-pocket geometry (shell
r in [8,14] Angstrom around the site, min CA-CA separation 3.8 Angstrom, one CA per
~85 A^3 — matching folded-protein density, unlike a Gaussian blob which is
~7x too dense and defeats the 6 A cutoff).

Usage: python benchmarks/egnn_probe.py [--quick]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from cmdgen_tpu.utils.synthetic import realistic_ca_pocket  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--modes", default="dense,nb16,nb24,nb32,nb48")
    ap.add_argument("--batches", default="48,128,256")
    ap.add_argument("--t-steps", type=int, default=50)
    args = ap.parse_args()

    from cmdgen_tpu.config import ca_config
    from cmdgen_tpu.containers import PointCloud, mask_from_sizes
    from cmdgen_tpu.diffusion.cddpm import ConditionalDDPM
    from cmdgen_tpu.models.dynamics import EGNNDynamics

    base = ca_config()
    n_p, n_q = 8, 110
    t_steps = 10 if args.quick else args.t_steps
    rngnp = np.random.RandomState(0)

    batches = [int(b) for b in args.batches.split(",")]
    if args.quick:
        batches = batches[:1]

    # neighbor-count statistics for the geometry (sanity for K choice)
    pk = realistic_ca_pocket(rngnp, n_q)
    ph = rngnp.randn(n_p, 3).astype(np.float32) * 2.0
    allpts = np.concatenate([ph, pk])
    d2 = ((allpts[:, None] - allpts[None]) ** 2).sum(-1)
    counts = (d2 <= 36.0).sum(-1)
    print(f"# neighbor counts @6A: mean={counts.mean():.1f} max={counts.max()}")

    from cmdgen_tpu.models.dynamics import make_pallas_apply

    for mode in args.modes.split(","):
        # modes: dense | nbK (XLA one-hot neighbor list) | pnbK (fused
        # Pallas neighbor kernel) | floor (no-op denoiser: sampler+scan
        # floor) | nbKnotopk (neighbor list without the top_k: its
        # compute-shape twin selects the first K columns — WRONG results,
        # timing ablation that isolates the per-step top_k cost)
        apply_fn = None
        notopk = noatt = False
        layers = None
        mode_eff = mode
        # timing-ablation suffixes (compute-shape twins; wrong results):
        # notopk = first-K columns instead of the top-k; noatt = attention
        # gate off; lN = N EquivariantBlocks instead of the config's count
        for _ in range(3):
            if mode_eff.endswith("notopk"):
                mode_eff, notopk = mode_eff[: -len("notopk")], True
            elif mode_eff.endswith("noatt"):
                mode_eff, noatt = mode_eff[: -len("noatt")], True
            elif mode_eff[-2] == "l" and mode_eff[-1].isdigit():
                layers = int(mode_eff[-1])
                mode_eff = mode_eff[:-2]
        if mode == "floor":
            egnn = dataclasses.replace(
                base.dynamics.egnn, compute_dtype=jnp.bfloat16
            )
            dyn_cfg = dataclasses.replace(base.dynamics, egnn=egnn)

            def apply_fn(params, z_phar, xh_pocket, t, m1, m2):
                eps = jnp.zeros_like(z_phar) + 1e-6 * t[..., None, :]
                return eps, xh_pocket

        elif mode == "dense":
            egnn = dataclasses.replace(
                base.dynamics.egnn, compute_dtype=jnp.bfloat16
            )
            dyn_cfg = dataclasses.replace(base.dynamics, egnn=egnn)
        elif mode_eff.startswith("mp"):
            # mpK: XLA neighbor-list engine with the per-GCL Pallas
            # message-pass kernel (ops/egnn_msgpass.py)
            k = int(mode_eff[2:])
            egnn = dataclasses.replace(
                base.dynamics.egnn, compute_dtype=jnp.bfloat16,
                neighbor_k=k, msgpass_pallas=True,
            )
            dyn_cfg = dataclasses.replace(base.dynamics, egnn=egnn)
        elif mode.startswith("pnb"):
            # pnbK or pnbKxS (S = samples per Pallas program)
            spec = mode[3:]
            k, _, sb = spec.partition("x")
            k, sb = int(k), int(sb or 1)
            egnn = dataclasses.replace(
                base.dynamics.egnn, compute_dtype=jnp.bfloat16, neighbor_k=k
            )
            dyn_cfg = dataclasses.replace(base.dynamics, egnn=egnn)
            apply_fn = make_pallas_apply(dyn_cfg, samples_per_program=sb)
        else:
            k = int(mode_eff[2:])
            egnn = dataclasses.replace(
                base.dynamics.egnn, compute_dtype=jnp.bfloat16, neighbor_k=k
            )
            dyn_cfg = dataclasses.replace(base.dynamics, egnn=egnn)
        if noatt or layers is not None:
            egnn = dataclasses.replace(
                dyn_cfg.egnn,
                attention=not noatt and dyn_cfg.egnn.attention,
                n_layers=layers or dyn_cfg.egnn.n_layers,
            )
            dyn_cfg = dataclasses.replace(dyn_cfg, egnn=egnn)
        if notopk:
            from cmdgen_tpu.models import egnn as egnn_mod

            def _fake_neighbor_list(x, edge_mask, kk, dtype=jnp.float32):
                n = x.shape[-2]
                kk = min(kk, n)
                idx = jnp.broadcast_to(
                    jnp.arange(kk)[None, None, :], (*x.shape[:-1], kk)
                )
                onehot = jax.nn.one_hot(idx, n, dtype=dtype)
                kmask = jnp.einsum(
                    "bikn,bin->bik", onehot, edge_mask.astype(dtype)
                )
                return onehot, kmask, idx.astype(jnp.int32)

            egnn_mod_orig = egnn_mod.build_neighbor_list
            egnn_mod.build_neighbor_list = _fake_neighbor_list
        dynamics = EGNNDynamics(dyn_cfg)
        model = ConditionalDDPM(base.ddpm, dynamics, apply_fn=apply_fn)
        for b in batches:
            rng = jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(rng, 3)
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
                lambda params, r: model.sample_given_pocket(
                    params, r, pocket, num_nodes, n_p, timesteps=t_steps
                )
            )
            out = sample(params, jax.random.PRNGKey(1))
            jax.block_until_ready(out)
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                out = sample(params, jax.random.PRNGKey(2 + i))
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            sps = b * t_steps / dt
            print(
                f"mode={mode:<6} B={b:<4} {dt*1e3/t_steps:7.2f} ms/batch-step"
                f"  {sps:10.0f} denoise steps/s"
            )
        if notopk:
            egnn_mod.build_neighbor_list = egnn_mod_orig


if __name__ == "__main__":
    main()
