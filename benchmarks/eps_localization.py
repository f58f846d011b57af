"""Localize the unclamped-spread error (VERDICT r4 next-2, diagnosis arm).

Generated clouds spread 4-6x the data (66-93 A vs 15.7 A) and neither
training budget (151k-755k steps flat), chain length (T=500 no better,
runs/qrun_t500/summary.json), nor DDIM (worse, 130 A) moved it. Before
buying capacity, measure WHERE the eps error lives:

  A. teacher-forced per-t error curve: noise val complexes at a fixed t
     grid with known eps (mirroring cddpm.loss_given_noise:253-292
     exactly), split the denoiser error into the coordinate block vs the
     type block, plus the x-norm ratio ||eps_hat_x||/||eps_x|| and the
     x-correlation. Predicting eps=0 scores err=1.0/dim, corr=0 — the
     no-signal baseline.
  B. reverse-chain spread trajectory: spread(t) (max pairwise distance,
     the eval metric) of the sampled chain at every frame vs the FORWARD
     marginal spread of q(z_t | x0) on the same pockets — the divergence
     point says which reverse steps inject the excess scale.

Usage: python benchmarks/eps_localization.py --diff-workdir runs/qrun_aa
       [--pockets 24] [--clamp-x 0]
Prints one JSON line per probe. ~6 min on one v5e (one compile each).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _load(workdir, neighbor_k, clamp_x):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "e2e_trained", pathlib.Path(__file__).parent / "e2e_trained.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.load_diffphar(workdir, neighbor_k, clamp_x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--diff-workdir", required=True)
    ap.add_argument("--pockets", type=int, default=24)
    ap.add_argument("--neighbor-k", type=int, default=16)
    ap.add_argument("--clamp-x", type=float, default=None)
    args = ap.parse_args()

    from cmdgen_tpu.containers import PointCloud
    from cmdgen_tpu.data.dataset import DiffPharDataset
    from cmdgen_tpu.diffusion.cddpm import sample_chain_given_pocket
    from cmdgen_tpu.ops import schedules as sch
    from cmdgen_tpu.ops.masked import sum_except_batch

    model, params, cfg = _load(
        args.diff_workdir, args.neighbor_k, args.clamp_x
    )
    ds = DiffPharDataset(
        pathlib.Path(args.diff_workdir) / "data" / "val.npz"
    )
    b = min(args.pockets, len(ds))
    batch = ds.padded_batch(list(range(b)))
    phar = PointCloud(
        x=jnp.asarray(batch["phar_x"]), h=jnp.asarray(batch["phar_h"]),
        mask=jnp.asarray(batch["phar_mask"]),
    )
    pocket = PointCloud(
        x=jnp.asarray(batch["pocket_x"]), h=jnp.asarray(batch["pocket_h"]),
        mask=jnp.asarray(batch["pocket_mask"]),
    )
    nd = cfg.ddpm.n_dims

    # ---------------- A: teacher-forced per-t error split ----------------
    @jax.jit
    def eps_err(t_int, eps):
        """Mirror of loss_given_noise's forward (cddpm.py:253-292)."""
        ph = model.normalize(phar)
        pk = model.normalize(pocket)
        gamma_t = model._gamma_at_int(params, jnp.asarray(t_int, jnp.float32))
        x_ph_c, x_pk_c = model._center(ph.x, pk.x, ph.mask, pk.mask)
        xh0_ph = jnp.concatenate([x_ph_c, ph.h], axis=-1)
        xh0_pk = jnp.concatenate([x_pk_c, pk.h], axis=-1)
        a_t = sch.alpha(gamma_t)[:, None, None]
        s_t = sch.sigma(gamma_t)[:, None, None]
        z_t = a_t * xh0_ph + s_t * eps
        z_t_x, xh_pk_x = model._center(
            z_t[..., :nd], xh0_pk[..., :nd], ph.mask, pk.mask
        )
        z_t = jnp.concatenate([z_t_x, z_t[..., nd:]], axis=-1)
        xh_pk = jnp.concatenate([xh_pk_x, xh0_pk[..., nd:]], axis=-1)
        t_norm = (jnp.asarray(t_int, jnp.float32) / cfg.ddpm.timesteps)[:, None]
        out, _ = model._apply(params, z_t, xh_pk, t_norm, ph.mask, pk.mask)
        m = ph.mask
        n_x = jnp.sum(m) * nd
        n_h = jnp.sum(m) * model.phar_nf
        ex, ox = eps[..., :nd], out[..., :nd]
        eh, oh = eps[..., nd:], out[..., nd:]
        err_x = jnp.sum(sum_except_batch((ex - ox) ** 2, m)) / n_x
        err_h = jnp.sum(sum_except_batch((eh - oh) ** 2, m)) / n_h
        dot = jnp.sum(sum_except_batch(ex * ox, m))
        nx2 = jnp.sum(sum_except_batch(ex**2, m))
        no2 = jnp.sum(sum_except_batch(ox**2, m))
        return err_x, err_h, dot / jnp.sqrt(nx2 * no2), jnp.sqrt(no2 / nx2)

    key = jax.random.PRNGKey(0)
    T = cfg.ddpm.timesteps
    t_grid = sorted({1, 2, 5, 10, 20, 35, 50, 65, 80, 90, 95, T - 1})
    curve = []
    for t in t_grid:
        key, sub = jax.random.split(key)
        eps = jax.random.normal(
            sub, (*phar.mask.shape, nd + model.phar_nf)
        ) * phar.mask[..., None]
        ex, eh, corr, nr = [float(np.asarray(v)) for v in eps_err(
            jnp.full((b,), t), eps
        )]
        curve.append({"t": t, "err_x": round(ex, 4), "err_h": round(eh, 4),
                      "corr_x": round(corr, 4),
                      "norm_ratio_x": round(nr, 4)})
    print(json.dumps({"metric": "per_t_eps_error", "T": T, "curve": curve}))

    # ---------------- B: reverse spread vs forward marginal --------------
    ref_sizes = phar.mask.sum(-1).astype(jnp.int32)
    key, k_chain, k_fwd = jax.random.split(key, 3)
    _, _, frames = sample_chain_given_pocket(
        model, params, k_chain, pocket, ref_sizes, ds.n_phar_max,
        keep_frames=T,
    )
    frames = np.asarray(frames)  # [F, B, N, 3] unnormalized
    m_np = np.asarray(phar.mask) > 0.5

    def spread(x_b):
        out = []
        for s in range(x_b.shape[0]):
            pts = x_b[s][m_np[s]]
            if len(pts) > 1:
                d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
                out.append(d.max())
        return float(np.mean(out)) if out else float("nan")

    # forward marginals at the frame timesteps (frame i is the state
    # after denoising to s = T-1-i)
    ph_n = model.normalize(phar)
    x_c, _ = model._center(ph_n.x, model.normalize(pocket).x,
                           ph_n.mask, pocket.mask)
    x_c = np.asarray(x_c)
    eps_f = np.asarray(jax.random.normal(k_fwd, x_c.shape)) * m_np[..., None]
    gam = np.asarray(model._gamma_at_int(
        params, jnp.arange(T, dtype=jnp.float32)))
    alph, sig = np.asarray(sch.alpha(jnp.asarray(gam))), np.asarray(
        sch.sigma(jnp.asarray(gam)))
    traj = []
    for i in range(frames.shape[0]):
        s_t = T - 1 - i
        fwd = alph[s_t] * x_c + sig[s_t] * eps_f
        traj.append({
            "t": int(s_t),
            "spread_gen": round(spread(frames[i]), 2),
            "spread_forward": round(
                spread(float(np.asarray(model.unnormalize_x(
                    jnp.asarray(1.0)))) * fwd), 2),
        })
    data_spread = spread(np.asarray(phar.x))
    print(json.dumps({
        "metric": "reverse_spread_trajectory", "data_spread":
        round(data_spread, 2),
        "traj": traj[:: max(1, len(traj) // 25)] + [traj[-1]],
    }))


if __name__ == "__main__":
    main()
