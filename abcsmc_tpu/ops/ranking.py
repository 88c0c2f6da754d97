"""Particle ranking (the filtering step).

Two schemes, matching the reference:

- SIMPLE (src/AbcUtil.cpp:408-421): z-score metrics by the *simulated* column
  mean/sd, z-score the observed row the same way, rank by euclidean distance.
- PLS (src/AbcUtil.cpp:423-458): z-score metrics and parameters; fit PLS of
  (z-parameters on z-metrics) on the first round(n * training_fraction) rows;
  choose the component count by NEW_DATA cross-validation on the remaining rows
  (max over responses of per-response PRESS-optimal counts); project all
  simulated metric rows and the observed row into score space; rank by euclidean
  distance there.

Both return the full ascending ordering; the caller trims to the predictive-prior
size (src/AbcSmc.cpp:644-646). ``top_k`` variants exist for very large
populations where only the survivor set is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from abcsmc_tpu.ops import pls as pls_mod
from abcsmc_tpu.ops import stats


def apply_box_cox(metric_vals, obs_row):
    """Per-column Box-Cox transform of metrics + observed row, choosing each
    lambda by skewness minimization (stats.optimize_box_cox). The reference
    left this as a TODO inside particle_ranking_PLS (src/AbcUtil.cpp:430);
    enabled via the config extension ``"box_cox": true``. Columns are shifted
    to positivity first (Box-Cox requires positive data)."""
    x = jnp.asarray(metric_vals)
    obs = jnp.asarray(obs_row)
    cols = []
    obs_out = []
    for j in range(x.shape[1]):
        col = x[:, j]
        o = obs[j]
        mn = jnp.minimum(jnp.min(col), o)
        shift = jnp.where(mn <= 0, 1e-6 - mn, 0.0)
        lam = stats.optimize_box_cox(col + shift)

        def tr(v):
            return jnp.where(
                lam == 0,
                jnp.log(v + shift),
                (jnp.power(v + shift, lam) - 1.0)
                / jnp.where(lam == 0, 1.0, lam),
            )

        cols.append(tr(col))
        obs_out.append(tr(o))
    return jnp.stack(cols, axis=1), jnp.stack(obs_out)


def _guard_sd(sds):
    """Zero-variance metric columns would NaN every distance in the reference
    (plain division, src/AbcUtil.cpp:412-416); consciously fixed here by
    treating a constant column as unit-scale."""
    return jnp.where(sds == 0, 1.0, sds)


def ranking_simple(metric_vals, obs_row):
    """Full ascending order of particles by z-scored metric distance."""
    x = jnp.asarray(metric_vals)
    means = jnp.mean(x, axis=0)
    sds = _guard_sd(stats.colwise_stdev(x, means))
    z = (x - means[None, :]) / sds[None, :]
    obs = (jnp.asarray(obs_row) - means) / sds
    dists = stats.euclidean(z, obs)
    return stats.ordered(dists), dists


def pls_scores_for_ranking(
    metric_vals, param_vals, obs_row, training_fraction: float,
    max_components: int | None = None, optimal_method: str = "vdv",
):
    """Fit + component selection + projection; returns (sim_scores, obs_scores,
    num_components_used). Split out so the sharded path can reuse it.

    ``optimal_method``: "vdv" (default - van der Voet randomization test with
    a fixed key, deterministic; the rule upstream tjhladish/PLS applies at
    src/AbcUtil.cpp:446-449) or "tolerance" (PRESS within 10% of min)."""
    x = jnp.asarray(metric_vals)
    y = jnp.asarray(param_vals)
    n = x.shape[0]

    met_means = jnp.mean(x, axis=0)
    met_sds = _guard_sd(stats.colwise_stdev(x, met_means))
    z_met = (x - met_means[None, :]) / met_sds[None, :]
    par_means = jnp.mean(y, axis=0)
    par_sds = _guard_sd(stats.colwise_stdev(y, par_means))
    z_par = (y - par_means[None, :]) / par_sds[None, :]
    obs_met = (jnp.asarray(obs_row) - met_means) / met_sds

    # round() to nearest, matching C round (src/AbcUtil.cpp:438)
    n_train = int(n * training_fraction + 0.5)
    n_train = min(max(n_train, 1), n - 1)

    model = pls_mod.fit(z_met[:n_train], z_par[:n_train], ncomp=max_components)
    if optimal_method == "vdv":
        counts = pls_mod.optimal_num_components_vdv(
            model, z_met[n_train:], z_par[n_train:], jax.random.PRNGKey(0),
            # absolute row indices: the sign stream is a function of the
            # GLOBAL row index, so this host rule and the mesh-sharded vdv
            # (parallel.generation) are the same statistic on the same data
            gidx=jnp.arange(n_train, n),
        )
    else:
        em = model.cv_new_data(z_met[n_train:], z_par[n_train:])
        counts = pls_mod.optimal_num_components(em)
    ncomp_used = int(jnp.max(counts))

    obs_scores = model.scores(obs_met[None, :], ncomp_used)[0]
    sim_scores = model.scores(z_met, ncomp_used)
    return sim_scores, obs_scores, ncomp_used


def ranking_pls(
    metric_vals, param_vals, obs_row, training_fraction: float,
    max_components: int | None = None, box_cox: bool = False,
    optimal_method: str = "vdv",
):
    """Full ascending order of particles by PLS-score distance
    (src/AbcUtil.cpp:423-458)."""
    assert 0.0 < training_fraction <= 1.0
    if box_cox:
        metric_vals, obs_row = apply_box_cox(metric_vals, obs_row)
    sim_scores, obs_scores, ncomp = pls_scores_for_ranking(
        metric_vals, param_vals, obs_row, training_fraction, max_components,
        optimal_method,
    )
    dists = stats.euclidean(sim_scores, obs_scores)
    return stats.ordered(dists), dists


def top_k_from_distances(dists, k: int):
    """Indices of the k smallest distances, ascending - the survivor set, for
    populations too large to fully argsort profitably."""
    neg_top, idx = jax.lax.top_k(-jnp.asarray(dists), k)
    return idx
