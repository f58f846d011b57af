"""Clustering on TPU: KMeans (Lloyd), full-covariance GMM (EM), DBSCAN.

Device-side equivalents of the sklearn calls in the consensus stage
(GaussianMixture(n_components, random_state), get_phar/GMM_json.py:29-30;
KMeans, kmeans_json.py; DBSCAN(eps, min_samples), point_dultarget_DBSCAN.py:
281-282). Each is a fixed-iteration ``lax``-friendly loop over dense
[N, D] point arrays — thousands of sampled pharmacophore points cluster in
one jit call instead of a host round-trip per fit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jnp.ndarray   # [K, D]
    labels: jnp.ndarray    # [N]
    inertia: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("k", "iters", "n_init"))
def kmeans(rng, x: jnp.ndarray, k: int, iters: int = 50,
           n_init: int = 4) -> KMeansResult:
    """Lloyd's algorithm with kmeans++-style seeding, best of n_init runs.

    Jitted whole (k/iters static): the consensus stage calls this per
    hypothesis, and eager dispatch of the seeding/EM ops costs far more
    than the fit itself on TPU."""
    n = x.shape[0]

    def single(key):
        # kmeans++ seeding
        k0, key = jax.random.split(key)
        first = jax.random.randint(k0, (), 0, n)
        centers0 = jnp.zeros((k, x.shape[1])).at[0].set(x[first])

        def seed_step(i, carry):
            centers, key = carry
            key, sub = jax.random.split(key)
            d2 = jnp.min(
                jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
                + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
                axis=1,
            )
            probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
            idx = jax.random.categorical(sub, jnp.log(probs + 1e-12))
            return centers.at[i].set(x[idx]), key

        centers, _ = jax.lax.fori_loop(1, k, seed_step, (centers0, key))

        def lloyd(_, centers):
            d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
            labels = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(labels, k)
            counts = jnp.sum(onehot, axis=0)
            sums = onehot.T @ x
            new = sums / jnp.maximum(counts[:, None], 1.0)
            return jnp.where(counts[:, None] > 0, new, centers)

        centers = jax.lax.fori_loop(0, iters, lloyd, centers)
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
        labels = jnp.argmin(d2, axis=1)
        inertia = jnp.sum(jnp.min(d2, axis=1))
        return centers, labels, inertia

    keys = jax.random.split(rng, n_init)
    centers, labels, inertias = jax.vmap(single)(keys)
    best = jnp.argmin(inertias)
    return KMeansResult(centers[best], labels[best], inertias[best])


class GMMResult(NamedTuple):
    means: jnp.ndarray      # [K, D]
    covs: jnp.ndarray       # [K, D, D]
    weights: jnp.ndarray    # [K]
    log_likelihood: jnp.ndarray


def _log_gauss(x, mean, cov):
    d = x.shape[-1]
    chol = jnp.linalg.cholesky(cov + 1e-6 * jnp.eye(d))
    diff = x - mean
    sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
    maha = jnp.sum(sol**2, axis=0)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * (d * jnp.log(2 * jnp.pi) + logdet + maha)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def gmm_fit(rng, x: jnp.ndarray, k: int, iters: int = 100) -> GMMResult:
    """Full-covariance EM, kmeans-initialized (sklearn defaults). Jitted
    whole (see kmeans)."""
    n, d = x.shape
    km = kmeans(rng, x, k, iters=20, n_init=1)
    means0 = km.centers
    covs0 = jnp.tile(jnp.cov(x.T) + 1e-3 * jnp.eye(d), (k, 1, 1))
    weights0 = jnp.full((k,), 1.0 / k)

    def em(_, state):
        means, covs, weights, _ = state
        logp = jax.vmap(lambda m, c: _log_gauss(x, m, c))(means, covs)  # [K,N]
        logp = logp + jnp.log(weights)[:, None]
        log_norm = jax.scipy.special.logsumexp(logp, axis=0)
        resp = jnp.exp(logp - log_norm)  # [K, N]
        nk = jnp.sum(resp, axis=1) + 1e-10
        means = (resp @ x) / nk[:, None]
        diff = x[None, :, :] - means[:, None, :]  # [K,N,D]
        covs = jnp.einsum("kn,knd,kne->kde", resp, diff, diff) / nk[:, None, None]
        covs = covs + 1e-6 * jnp.eye(d)
        weights = nk / n
        return means, covs, weights, jnp.sum(log_norm)

    means, covs, weights, ll = jax.lax.fori_loop(
        0, iters, em, (means0, covs0, weights0, jnp.asarray(0.0))
    )
    return GMMResult(means, covs, weights, ll)


@jax.jit
def gmm_predict_proba(gmm: GMMResult, x: jnp.ndarray) -> jnp.ndarray:
    """[N, K] responsibilities."""
    logp = jax.vmap(lambda m, c: _log_gauss(x, m, c))(gmm.means, gmm.covs)
    logp = logp + jnp.log(gmm.weights)[:, None]
    log_norm = jax.scipy.special.logsumexp(logp, axis=0)
    return jnp.exp(logp - log_norm).T


def gmm_predict(gmm: GMMResult, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(gmm_predict_proba(gmm, x), axis=1)


@jax.jit
def dbscan(x: jnp.ndarray, eps: float, min_samples: int):
    """DBSCAN via dense pairwise distances + label propagation.

    Returns labels [N] with -1 for noise (sklearn convention). Cluster ids
    are arbitrary but consistent (the minimum point index in the cluster's
    core graph component).
    """
    n = x.shape[0]
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
    adj = d2 <= eps * eps
    n_nbrs = jnp.sum(adj, axis=1)  # includes self, like sklearn
    core = n_nbrs >= min_samples
    # connected components over core-core edges, by min-label propagation
    core_adj = adj & core[:, None] & core[None, :]
    labels = jnp.where(core, jnp.arange(n), n)

    def prop(state):
        labels, _ = state
        nbr_min = jnp.min(
            jnp.where(core_adj, labels[None, :], n), axis=1
        )
        new = jnp.where(core, jnp.minimum(labels, nbr_min), labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], prop, (labels, jnp.asarray(True))
    )
    # border points join the cluster of any core neighbor
    border_label = jnp.min(
        jnp.where(adj & core[None, :], labels[None, :], n), axis=1
    )
    labels = jnp.where(core, labels, border_label)
    return jnp.where(labels >= n, -1, labels)
