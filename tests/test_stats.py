"""Stats kernels vs the reference's hand-computed fixtures
(tests/abcutil.cpp, tests/pls.cpp) and literal numpy re-derivations."""

import jax.numpy as jnp
import numpy as np
import pytest

from abcsmc_tpu.ops import stats


def test_colwise_z_scores_reference_fixture():
    # tests/abcutil.cpp:10-21
    ref = jnp.array([[1.0, 1, 1], [2, 3, 4], [3, 5, 7]])
    target = np.array([[-1.0, -1, -1], [0, 0, 0], [1, 1, 1]])
    res = np.asarray(stats.colwise_z_scores(ref))
    assert ((target - res) ** 2).sum() < 1e-6


def test_euclidean_reference_fixture():
    # tests/abcutil.cpp:23-39
    ref = jnp.array([[1.0, 1], [3, 3]])
    tar = jnp.array([1.0, 1])
    res = np.asarray(stats.euclidean(ref, tar))
    np.testing.assert_allclose(res, [0.0, 2.828427], atol=1e-6)


def test_ordered_reference_fixture():
    # tests/pls.cpp:6-24
    assert list(np.asarray(stats.ordered(jnp.array([1.0, 2, 3])))) == [0, 1, 2]
    assert list(np.asarray(stats.ordered(jnp.array([2.0, 1, 3])))) == [1, 0, 2]


def test_median_even_odd():
    assert float(stats.median(jnp.array([3.0, 1, 2]))) == 2.0
    assert float(stats.median(jnp.array([4.0, 1, 2, 3]))) == 2.5


def test_quantile_ranker_semantics():
    # ranker.h:191-207: pos=(n-1)q, linear interpolation
    data = jnp.array([10.0, 20, 30, 40])
    assert float(stats.quantile(data, 0.5)) == 25.0
    assert float(stats.quantile(data, 0.25)) == pytest.approx(17.5)
    assert float(stats.quantile(data, 0.0)) == 10.0
    assert float(stats.quantile(data, 1.0)) == 40.0


def test_variance_and_skewness():
    x = jnp.array([1.0, 2, 3, 4, 10])
    assert float(stats.variance(x)) == pytest.approx(np.var(np.asarray(x), ddof=1))
    # reference skewness: (sum((x-m)^3)/n) / var(ddof=1)^1.5
    xn = np.asarray(x)
    m = xn.mean()
    v = xn.var(ddof=1)
    expect = ((xn - m) ** 3).sum() / len(xn) / v**1.5
    assert float(stats.skewness(x)) == pytest.approx(expect)
    assert float(stats.skewness(jnp.array([2.0, 2, 2]))) == 0.0


def test_doubled_variance():
    x = jnp.array([[1.0, 10], [2, 20], [3, 30]])
    dv = np.asarray(stats.doubled_variance(x))
    np.testing.assert_allclose(dv, [2.0, 200.0])


def test_nrmse_reference_semantics():
    obs = jnp.array([2.0, 5.0])
    mets = jnp.array([[4.0, 5.0], [4.0, 5.0]])
    # sim means = [4, 5]; expected = [(2+4)/2, 1 (forced: sim==obs)]
    # deltas = [(4-2)/3, 0] -> sqrt(mean([4/9, 0])) = sqrt(2/9)
    val = float(stats.nrmse(mets, obs))
    assert val == pytest.approx(np.sqrt(2.0 / 9.0))


def test_mle_covariance():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 3))
    ours = np.asarray(stats.mle_covariance(jnp.asarray(x)))
    np.testing.assert_allclose(ours, np.cov(x.T, ddof=1), rtol=1e-10)


def test_box_cox_log_preference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.exp(rng.normal(size=500)))  # lognormal: lambda ~ 0
    lam = float(stats.optimize_box_cox(x))
    assert abs(lam) < 0.35
