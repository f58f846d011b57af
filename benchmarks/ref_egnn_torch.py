"""Measure the REFERENCE EGNN itself (CPU torch) at the bench.py shapes.

BASELINE.md's protocol says the first benchmarking task is to *measure the
reference* — this does that for the one reference module that runs in this
image: ``DiffPhar/equivariant_diffusion/egnn_new.py`` imports only
torch+math, so the hot op of the whole pipeline (the EGNN denoiser forward,
egnn_new.py:159-208, executed T times per sampled item) is directly
measurable under the CPU torch 2.13 present here.

Shapes mirror bench.py exactly (CA flagship config,
crossdocked_ca_cond.yml): hidden 256, 5 EquivariantBlocks, inv_sublayers 1,
attention+tanh, normalization_factor 100, B=48 samples of N=118 nodes
(8 pharmacophore + 110 CA pocket) with the same realistic shell-geometry
pockets and the same 6 Å-cutoff adjacency (self-edges included,
dynamics.py:141-147). One "denoise step" = one EGNN forward for one sample,
the same unit bench.py reports; the measurement is favorable to the
reference (inference no_grad, all host cores, excludes the DDPM algebra
around the net).

Run:  python benchmarks/ref_egnn_torch.py [--batch 48] [--iters 5]
Prints one JSON line with steps/s; paste into BASELINE.md.
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch  # noqa: E402


def load_reference_egnn():
    path = "/root/reference/DiffPhar/equivariant_diffusion/egnn_new.py"
    spec = importlib.util.spec_from_file_location("ref_egnn_new", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cutoff", type=float, default=6.0)
    args = ap.parse_args()

    # numpy-only helper from the repo (no jax backend is initialized)
    from cmdgen_tpu.utils.synthetic import realistic_ca_pocket

    ref = load_reference_egnn()
    n_p, n_q, hidden, joint_nf = 8, 110, 256, 32
    n = n_p + n_q
    b = args.batch

    torch.manual_seed(0)
    model = ref.EGNN(
        in_node_nf=joint_nf + 1,  # +1: time conditioning (dynamics.py:92-99)
        in_edge_nf=1,
        hidden_nf=hidden,
        n_layers=5,
        inv_sublayers=1,
        attention=True,
        tanh=True,
        coords_range=15.0,
        norm_constant=1.0,
        normalization_factor=100.0,
        aggregation_method="sum",
        out_node_nf=joint_nf + 1,
    )
    model.eval()

    # same pocket geometry as bench.py; pharmacophore points near the site
    xs = []
    for i in range(b):
        rs = np.random.RandomState(i % 8)
        pocket = realistic_ca_pocket(rs, n_q)
        phar = rs.standard_normal((n_p, 3)) * 2.0
        xs.append(np.concatenate([phar, pocket]).astype(np.float32))
    x_flat = torch.tensor(np.concatenate(xs))
    h_flat = torch.randn(b * n, joint_nf + 1)

    # 6 Å-cutoff adjacency per sample, self-edges kept (dynamics.py:141-147)
    rows, cols = [], []
    for i, xi in enumerate(xs):
        d = np.linalg.norm(xi[:, None] - xi[None, :], axis=-1)
        adj = (d <= args.cutoff) | np.eye(n, dtype=bool)
        r, c = np.nonzero(adj)
        rows.append(r + i * n)
        cols.append(c + i * n)
    edge_index = (
        torch.tensor(np.concatenate(rows), dtype=torch.long),
        torch.tensor(np.concatenate(cols), dtype=torch.long),
    )
    n_edges = len(edge_index[0])

    # frozen pocket coords, like the conditional model
    ucm = torch.zeros(b * n, 1)
    ucm.view(b, n, 1)[:, :n_p] = 1.0

    with torch.no_grad():
        model(h_flat, x_flat.clone(), edge_index, update_coords_mask=ucm)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            h_out, x_out = model(
                h_flat, x_flat.clone(), edge_index, update_coords_mask=ucm
            )
            times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        json.dumps(
            {
                "metric": "reference_egnn_denoise_steps_per_sec_cpu_torch",
                "value": round(b / dt, 2),
                "unit": "denoise steps/s (reference egnn_new.py, CPU torch "
                f"{torch.__version__}, {torch.get_num_threads()} threads, "
                f"B={b}, N={n}, {n_edges} edges, hidden 256 x 5 blocks)",
                "ms_per_forward": round(dt * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
