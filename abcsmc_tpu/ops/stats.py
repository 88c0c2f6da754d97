"""Statistical primitives, vectorized.

Parity targets: ABC:: stats helpers in /root/reference/src/AbcUtil.cpp (median:46-62,
quantile:64-66 via lib/ranker.h:191-207, variance:68-75, skewness:82-87, box-cox:
89-109, euclidean:320-324, nrmse:326-345) and the PLS helpers used at call sites
(colwise_z_scores / colwise_stdev / z_scores, exercised at src/AbcUtil.cpp:408-436;
fixture behavior pinned by tests/abcutil.cpp: column [1,2,3] -> [-1,0,1], i.e.
ddof=1 standard deviations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def colwise_mean(x):
    return jnp.mean(x, axis=0)


def colwise_stdev(x, means=None, ddof: int = 1):
    """Column standard deviations with ddof=1 (pinned by tests/abcutil.cpp:10-21)."""
    x = jnp.asarray(x)
    if means is None:
        means = jnp.mean(x, axis=0)
    n = x.shape[0]
    ss = jnp.sum((x - means[None, :]) ** 2, axis=0)
    return jnp.sqrt(ss / (n - ddof))


def z_scores(row, means, stdevs):
    """Z-score a single row against given means/sds (src/AbcUtil.cpp:414,436)."""
    return (row - means) / stdevs


def colwise_z_scores(x, means=None, stdevs=None):
    """Column-wise z-scores (1- and 3-arg forms, src/AbcUtil.cpp:412-435)."""
    x = jnp.asarray(x)
    if means is None:
        means = jnp.mean(x, axis=0)
    if stdevs is None:
        stdevs = colwise_stdev(x, means)
    return (x - means[None, :]) / stdevs[None, :]


def euclidean(sims, ref):
    """Row-wise euclidean distance to a reference row (src/AbcUtil.cpp:320-324)."""
    d = jnp.asarray(sims) - jnp.asarray(ref)[None, :]
    return jnp.sqrt(jnp.sum(d * d, axis=1))


def median(x):
    """Average-of-middle-two median (src/AbcUtil.cpp:46-62)."""
    return jnp.median(jnp.asarray(x))


def quantile(x, q: float):
    """ranker.h:191-207 quantile: pos = (n-1)q; linear interpolation between the
    pos-th order statistic and the next (equivalent to the 'linear' method)."""
    x = jnp.asarray(x)
    return jnp.quantile(x, q, method="linear")


def variance(x, mean=None, ddof: int = 1):
    x = jnp.asarray(x)
    if x.size < 2:
        return jnp.zeros((), x.dtype)
    if mean is None:
        mean = jnp.mean(x)
    return jnp.sum((x - mean) ** 2) / (x.size - ddof)


def skewness(x):
    """Population-skewness variant used by the reference (src/AbcUtil.cpp:82-87):
    third central moment / n, over variance(ddof=1)^1.5; 0 when variance is 0."""
    x = jnp.asarray(x)
    m = jnp.mean(x)
    v = variance(x, m)
    third = jnp.sum((x - m) ** 3) / x.size
    return jnp.where(v == 0, 0.0, third / jnp.power(v, 1.5))


def box_cox_lambda_grid(lambda_min=-5.0, lambda_max=5.0, step=0.1):
    """The lambda search grid, built so grid points are EXACT multiples of
    ``step`` (in particular lambda == 0.0 exactly, selecting the log branch).
    A floating-point-accumulated arange lands at ~9e-16 instead of 0, and
    ``(x^lam - 1)/lam`` at that lambda is log(x) quantized to a few ulp (in
    f32 it collapses to exactly 0) - skewness of that column is then
    spuriously minimal."""
    import numpy as _np

    n_steps = int(round((lambda_max - lambda_min) / step))
    base = round(lambda_min / step)
    if abs(base * step - lambda_min) < 1e-9:
        return _np.asarray((_np.arange(n_steps + 1) + base) * step)
    return _np.asarray(lambda_min + step * _np.arange(n_steps + 1))


def optimize_box_cox(x, lambda_min=-5.0, lambda_max=5.0, step=0.1):
    """Grid-search the Box-Cox lambda minimizing |skewness| (src/AbcUtil.cpp:89-109)."""
    x = jnp.asarray(x)
    lambdas = jnp.asarray(box_cox_lambda_grid(lambda_min, lambda_max, step))

    def skew_for(lam):
        transformed = jnp.where(
            lam == 0, jnp.log(x), (jnp.power(x, lam) - 1.0) / jnp.where(lam == 0, 1.0, lam)
        )
        return skewness(transformed)

    skews = jax.vmap(skew_for)(lambdas)
    # reference keeps the *first* lambda attaining the min |skew| (strict <).
    # Extreme lambdas can overflow the moments to inf/NaN (e.g. x^-5 of a
    # near-zero shifted value); argmin treats NaN as minimal, so disqualify
    # non-finite skews explicitly
    askew = jnp.where(jnp.isfinite(skews), jnp.abs(skews), jnp.inf)
    return lambdas[jnp.argmin(askew)]


def doubled_variance(params):
    """Per-column 2 * sample variance (ddof=1) of the predictive prior
    (src/AbcUtil.cpp:528-537 via RunningStat.h:40-46)."""
    params = jnp.asarray(params)
    means = jnp.mean(params, axis=0)
    n = params.shape[0]
    var = jnp.sum((params - means[None, :]) ** 2, axis=0) / jnp.maximum(n - 1, 1)
    return 2.0 * var


def nrmse(posterior_mets, observed):
    """Normalized RMSE of posterior metric means vs observed
    (src/AbcUtil.cpp:326-345): expected = (|obs| + |sim|)/2, forced to 1 where
    sim == obs; result = sqrt(mean(((sim-obs)/expected)^2))."""
    posterior_mets = jnp.asarray(posterior_mets)
    observed = jnp.asarray(observed)
    sim = jnp.mean(posterior_mets, axis=0)
    expected = (jnp.abs(observed) + jnp.abs(sim)) / 2.0
    expected = jnp.where(sim == observed, 1.0, expected)
    res = jnp.mean(((sim - observed) / expected) ** 2)
    return jnp.sqrt(res)


def ordered(values):
    """Ascending sort-order indices (PLS `ordered`, pinned by tests/pls.cpp:6-24)."""
    return jnp.argsort(jnp.asarray(values), stable=True)


def logit(p):
    """log(p / (1-p)) (AbcUtil.h:45)."""
    p = jnp.asarray(p)
    return jnp.log(p / (1.0 - p))


def logistic(x):
    """1 / (1 + exp(-x)) (AbcUtil.h:46)."""
    return 1.0 / (1.0 + jnp.exp(-jnp.asarray(x)))


def ranks(values):
    """Rank of each element in ascending order (lib/ranker.h `rank`):
    ranks[i] = position of values[i] in the sorted order."""
    order = jnp.argsort(jnp.asarray(values), stable=True)
    return jnp.argsort(order, stable=True)


class RunningStat:
    """Welford online mean/variance (include/AbcSmc/RunningStat.h:16-50),
    kept for API parity; vectorized code should use doubled_variance()."""

    def __init__(self):
        self._n = 0
        self._mean = 0.0
        self._s = 0.0

    def clear(self):
        self.__init__()

    def push(self, x):
        import numpy as _np
        for v in _np.atleast_1d(_np.asarray(x, _np.float64)).ravel():
            self._n += 1
            if self._n == 1:
                self._mean, self._s = float(v), 0.0
            else:
                old = self._mean
                self._mean = old + (v - old) / self._n
                self._s = self._s + (v - old) * (v - self._mean)

    def num_data_values(self) -> int:
        return self._n

    def mean(self) -> float:
        return self._mean if self._n > 0 else 0.0

    def variance(self) -> float:
        return self._s / (self._n - 1) if self._n > 1 else 0.0

    def standard_deviation(self) -> float:
        import math
        return math.sqrt(self.variance())


def mle_covariance(params, ddof: int = 1):
    """Variance-covariance matrix of the rows (src/AbcUtil.cpp:462-488).

    The reference delegates to gsl_ran_multivariate_gaussian_vcov; we use the
    standard ddof=1 estimator (consistent with RunningStat's per-parameter
    variance used for the INDEPENDENT kernel)."""
    params = jnp.asarray(params)
    n = params.shape[0]
    centered = params - jnp.mean(params, axis=0)[None, :]
    return (centered.T @ centered) / jnp.maximum(n - ddof, 1)
