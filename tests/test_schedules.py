"""Noise-schedule algebra against closed forms and the torch reference math.

The ground truth identities come straight from VDM:
  alpha^2 + sigma^2 = 1, SNR = alpha^2/sigma^2 = exp(-gamma),
  alpha_{t|s} = alpha_t/alpha_s, sigma^2_{t|s} = sigma_t^2 - alpha_{t|s}^2 sigma_s^2.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cmdgen_tpu.ops import schedules as sch


@pytest.mark.parametrize("name", ["polynomial_2", "polynomial_3", "cosine"])
@pytest.mark.parametrize("T", [100, 500])
def test_gamma_monotone_and_consistent(name, T):
    tab = sch.gamma_table(name, T)
    assert tab.shape == (T + 1,)
    g = np.asarray(tab)
    assert np.all(np.diff(g) > 0), "gamma must be strictly increasing"
    a, s = np.asarray(sch.alpha(tab)), np.asarray(sch.sigma(tab))
    np.testing.assert_allclose(a**2 + s**2, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sch.snr(tab)), a**2 / s**2, rtol=1e-4)


def test_polynomial_matches_formula():
    # direct recomputation of the polynomial_2 alphas^2 definition
    T, s, power = 50, 1e-4, 2.0
    steps = T + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - (x / steps) ** power) ** 2
    alphas2 = np.concatenate([np.ones(1), alphas2])
    ratio = np.clip(alphas2[1:] / alphas2[:-1], 0.001, 1.0)
    alphas2 = np.cumprod(ratio) * (1 - 2 * s) + s
    got = np.asarray(sch.polynomial_alphas2(T, s=s, power=power))
    # note: reference applies precision scaling after cumprod; replicate order
    expect = (1 - 2 * s) * np.cumprod(ratio) + s
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_transition_coefficients_identity():
    tab = sch.gamma_table("polynomial_2", 100)
    t = jnp.asarray([0.7])
    s = jnp.asarray([0.3])
    g_t, g_s = sch.gamma_at(tab, t), sch.gamma_at(tab, s)
    s2_ts, s_ts, a_ts = sch.sigma_and_alpha_t_given_s(g_t, g_s)
    a_t, a_s = sch.alpha(g_t), sch.alpha(g_s)
    sg_t, sg_s = sch.sigma(g_t), sch.sigma(g_s)
    np.testing.assert_allclose(np.asarray(a_ts), np.asarray(a_t / a_s), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s2_ts),
        np.asarray(sg_t**2 - a_ts**2 * sg_s**2),
        rtol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(s_ts) ** 2, np.asarray(s2_ts), rtol=1e-6)


def test_gamma_lookup_rounding():
    tab = sch.gamma_table("polynomial_2", 10)
    # t=0.25 with T=10 rounds to index 2 or 3 per round-half-to-even; check exact indices
    np.testing.assert_allclose(
        np.asarray(sch.gamma_at(tab, jnp.asarray([0.0, 0.5, 1.0]))),
        np.asarray(tab)[[0, 5, 10]],
    )


def test_cdf_standard_gaussian():
    from scipy.stats import norm

    x = jnp.linspace(-3, 3, 13)
    np.testing.assert_allclose(
        np.asarray(sch.cdf_standard_gaussian(x)), norm.cdf(np.asarray(x)), atol=1e-6
    )
