"""Microbenchmark: neighbor-gather strategies on TPU.

The fixed-K EGNN needs out[b,i,k] = v[b, idx[b,i,k]] for v [B,N,H].
XLA:TPU lowers integer gathers to slow loops; a one-hot matmul rides the
MXU instead. Times each strategy (plus lax.top_k neighbor selection) at the
flagship shapes.

Run: python benchmarks/gather_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # sync via host fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<28} {dt*1e6:9.1f} us")
    return dt


def main():
    B, N, K, H = 48, 118, 16, 256
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(B, N, H).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    onehot = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # [B,N,K,N]
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    emask = jnp.ones((B, N, N))

    g_vmap = jax.jit(lambda v, i: jax.vmap(lambda vb, ib: vb[ib])(v, i))
    g_take = jax.jit(
        lambda v, i: jnp.take_along_axis(
            v[:, None], i[..., None].repeat(1, -1), axis=2
        )
    )
    g_onehot = jax.jit(lambda v, oh: jnp.einsum("bikn,bnd->bikd", oh, v))
    g_onehot_mk = jax.jit(
        lambda v, i: jnp.einsum(
            "bikn,bnd->bikd", jax.nn.one_hot(i, N, dtype=v.dtype), v
        )
    )

    def topk(xc, em, k):
        d2 = jnp.sum((xc[:, :, None] - xc[:, None]) ** 2, -1)
        sc = jnp.where(em > 0, -d2, -jnp.inf)
        return jax.lax.top_k(sc, k)

    topk_j = jax.jit(topk, static_argnums=2)

    bench("gather vmap-index", g_vmap, v, idx)
    bench("gather onehot (prebuilt)", g_onehot, v, onehot)
    bench("gather onehot (fused make)", g_onehot_mk, v, idx)
    bench("top_k neighbor select", topk_j, x, emask, K)
    # 10 gathers back to back (per-denoise-step load)
    ten_vmap = jax.jit(
        lambda v, i: sum(
            jax.vmap(lambda vb, ib: vb[ib])(v * (j + 1), i) for j in range(10)
        ).sum()
    )
    ten_oh = jax.jit(
        lambda v, oh: sum(
            jnp.einsum("bikn,bnd->bikd", oh, v * (j + 1)) for j in range(10)
        ).sum()
    )
    bench("10x gather vmap-index", ten_vmap, v, idx)
    bench("10x gather onehot", ten_oh, v, onehot)


if __name__ == "__main__":
    main()
