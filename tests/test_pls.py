"""PLS regression: algebraic invariants + agreement with a literal NIPALS
reference implementation (numpy) and with OLS at full rank."""

import jax.numpy as jnp
import numpy as np
import pytest

from abcsmc_tpu.ops import pls


def nipals_pls(X, Y, ncomp):
    """Textbook NIPALS PLS2 (numpy, float64) as the independent oracle."""
    X = X.copy().astype(np.float64)
    Y = Y.copy().astype(np.float64)
    n, m = X.shape
    p = Y.shape[1]
    W = np.zeros((m, ncomp))
    P = np.zeros((m, ncomp))
    Q = np.zeros((p, ncomp))
    T = np.zeros((n, ncomp))
    Xd, Yd = X.copy(), Y.copy()
    for a in range(ncomp):
        u = Yd[:, np.argmax((Yd**2).sum(0))].copy()
        for _ in range(500):
            w = Xd.T @ u
            w /= np.linalg.norm(w)
            t = Xd @ w
            q = Yd.T @ t / (t @ t)
            u_new = Yd @ q / (q @ q)
            if np.linalg.norm(u_new - u) < 1e-12 * np.linalg.norm(u_new):
                u = u_new
                break
            u = u_new
        t = Xd @ w
        pvec = Xd.T @ t / (t @ t)
        qvec = Yd.T @ t / (t @ t)
        Xd = Xd - np.outer(t, pvec)
        Yd = Yd - np.outer(t, qvec)
        W[:, a], P[:, a], Q[:, a], T[:, a] = w, pvec, qvec, t
    R = W @ np.linalg.inv(P.T @ W)
    B = R @ Q.T
    return dict(W=W, P=P, Q=Q, T=T, R=R, B=B)


def _zscore(x):
    return (x - x.mean(0)) / x.std(0, ddof=1)


def make_problem(n=200, m=8, p=3, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, m))
    B_true = rng.normal(size=(m, p))
    Y = X @ B_true + noise * rng.normal(size=(n, p))
    return _zscore(X), _zscore(Y)


def test_pls_matches_nipals_scores_and_coefficients():
    X, Y = make_problem()
    ncomp = 4
    ours = pls.fit(jnp.asarray(X), jnp.asarray(Y), ncomp=ncomp)
    ref = nipals_pls(X, Y, ncomp)
    ours_T = np.asarray(ours.scores(jnp.asarray(X)))
    # scores are defined up to per-component sign
    for a in range(ncomp):
        ra, oa = ref["T"][:, a], ours_T[:, a]
        sign = np.sign(ra @ oa)
        np.testing.assert_allclose(oa * sign, ra, rtol=1e-5, atol=1e-7)
    # coefficients are sign-invariant
    np.testing.assert_allclose(
        np.asarray(ours.coefficients()), ref["B"], rtol=1e-5, atol=1e-7
    )


def test_scores_are_orthogonal():
    X, Y = make_problem(seed=3)
    model = pls.fit(jnp.asarray(X), jnp.asarray(Y), ncomp=5)
    T = np.asarray(model.scores(jnp.asarray(X)))
    G = T.T @ T
    off = G - np.diag(np.diag(G))
    assert np.abs(off).max() < 1e-6 * np.abs(np.diag(G)).max()


def test_full_rank_equals_ols():
    X, Y = make_problem(n=300, m=6, p=2, noise=0.5, seed=5)
    model = pls.fit(jnp.asarray(X), jnp.asarray(Y), ncomp=6)
    B_ols = np.linalg.lstsq(X, Y, rcond=None)[0]
    np.testing.assert_allclose(
        np.asarray(model.coefficients()), B_ols, rtol=1e-5, atol=1e-7
    )


def test_cv_new_data_press_contract():
    rng = np.random.default_rng(7)
    n, m, p = 400, 10, 3
    X = rng.normal(size=(n, m))
    latent = X @ rng.normal(size=(m, 2))
    Y = latent @ rng.normal(size=(2, p)) + 0.05 * rng.normal(size=(n, p))
    X, Y = _zscore(X), _zscore(Y)
    model = pls.fit(jnp.asarray(X[:200]), jnp.asarray(Y[:200]), ncomp=6)
    em = np.asarray(model.cv_new_data(jnp.asarray(X[200:]), jnp.asarray(Y[200:])))
    # held-out SSE decreases from 1 component to the optimum
    assert np.all(em[0] > em[-1])
    best = np.asarray(pls.optimal_num_components(jnp.asarray(em)))
    assert np.all(best >= 1) and np.all(best <= 6)
    # tolerance-rule contract: chosen count's PRESS within 10% of the min,
    # and no smaller count satisfies that
    for j, b in enumerate(best):
        assert em[b - 1, j] <= 1.1 * em[:, j].min()
        if b > 1:
            assert em[b - 2, j] > 1.1 * em[:, j].min()


def test_cv_em_is_sse_of_predictions():
    X, Y = make_problem(seed=21)
    model = pls.fit(jnp.asarray(X[:120]), jnp.asarray(Y[:120]), ncomp=4)
    Xv, Yv = X[120:], Y[120:]
    em = np.asarray(model.cv_new_data(jnp.asarray(Xv), jnp.asarray(Yv)))
    for a in range(1, 5):
        pred = np.asarray(model.predict(jnp.asarray(Xv), a))
        sse = ((Yv - pred) ** 2).sum(axis=0)
        np.testing.assert_allclose(em[a - 1], sse, rtol=1e-8)


def test_fit_from_gram_matches_fit():
    X, Y = make_problem(seed=11)
    xtx = jnp.asarray(X.T @ X)
    xty = jnp.asarray(X.T @ Y)
    m1 = pls.fit(jnp.asarray(X), jnp.asarray(Y), ncomp=3)
    m2 = pls.fit_from_gram(xtx, xty, ncomp=3)
    np.testing.assert_allclose(
        np.asarray(m1.rotations), np.asarray(m2.rotations), rtol=1e-8
    )


def test_single_response_path():
    X, Y = make_problem(p=1, seed=13)
    model = pls.fit(jnp.asarray(X), jnp.asarray(Y), ncomp=3)
    pred = np.asarray(model.predict(jnp.asarray(X)))
    resid = ((Y - pred) ** 2).mean()
    assert resid < 0.1


def test_cv_loo_downdate_equals_explicit_refit():
    X, Y = make_problem(n=60, m=5, p=2, seed=31)
    # explicit: refit without row 0, score on row 0
    m_wo = pls.fit(jnp.asarray(X[1:]), jnp.asarray(Y[1:]), ncomp=3)
    em_explicit = np.asarray(m_wo.cv_new_data(jnp.asarray(X[:1]),
                                              jnp.asarray(Y[:1])))
    # downdate path: total LOO matrix minus the contributions of rows 1..n-1
    em_all = np.asarray(pls.cv_loo(jnp.asarray(X), jnp.asarray(Y), 3))
    contrib = []
    for i in range(len(X)):
        mi = pls.fit(jnp.asarray(np.delete(X, i, 0)),
                     jnp.asarray(np.delete(Y, i, 0)), ncomp=3)
        contrib.append(np.asarray(mi.cv_new_data(
            jnp.asarray(X[i:i+1]), jnp.asarray(Y[i:i+1]))))
    np.testing.assert_allclose(em_all, np.sum(contrib, 0), rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_allclose(contrib[0], em_explicit, rtol=1e-8)


def test_cv_lso_selects_sensible_components():
    import jax
    X, Y = make_problem(n=200, m=8, p=3, seed=33, noise=0.3)
    em = np.asarray(pls.cv_lso(jnp.asarray(X), jnp.asarray(Y), 6,
                               jax.random.PRNGKey(0)))
    assert em.shape == (6, 3)
    assert np.all(em[0] > em[-1])  # more components help up to the truth
    best = np.asarray(pls.optimal_num_components(jnp.asarray(em)))
    assert np.all(best >= 1) and np.all(best <= 6)


def test_vdv_sign_stream_statistics():
    """The counter-based rademacher stream (pls.vdv_signs) must behave like
    iid fair signs: balanced, uncorrelated across permutations and across
    rows, and invariant to how the row set is partitioned (layout freedom -
    the property the sharded path relies on)."""
    import jax

    seed = pls.vdv_seed(jax.random.PRNGKey(3))
    n_perm, n_rows = 512, 4096
    s = np.asarray(pls.vdv_signs(seed, n_perm, jnp.arange(n_rows),
                                 jnp.float64))
    assert set(np.unique(s)) == {-1.0, 1.0}
    # balance: mean of n_perm*n_rows fair signs ~ N(0, 1/sqrt(nm))
    assert abs(s.mean()) < 5.0 / np.sqrt(s.size)
    # per-permutation and per-row balance (6 sigma)
    assert np.abs(s.mean(axis=1)).max() < 6.0 / np.sqrt(n_rows)
    assert np.abs(s.mean(axis=0)).max() < 6.0 / np.sqrt(n_perm)
    # adjacent-permutation and adjacent-row correlations vanish
    corr_p = np.mean(s[:-1] * s[1:])
    corr_r = np.mean(s[:, :-1] * s[:, 1:])
    assert abs(corr_p) < 6.0 / np.sqrt(s.size)
    assert abs(corr_r) < 6.0 / np.sqrt(s.size)
    # layout invariance: computing a row subset directly equals slicing
    sub = np.asarray(pls.vdv_signs(seed, n_perm,
                                   jnp.arange(100, 200), jnp.float64))
    np.testing.assert_array_equal(sub, s[:, 100:200])
    # a different seed decorrelates the stream
    seed2 = pls.vdv_seed(jax.random.PRNGKey(4))
    s2 = np.asarray(pls.vdv_signs(seed2, n_perm, jnp.arange(n_rows),
                                  jnp.float64))
    assert abs(np.mean(s * s2)) < 6.0 / np.sqrt(s.size)


def test_van_der_voet_component_selection():
    """vdv selection: parsimonious counts whose held-out errors are not
    significantly worse than the PRESS-minimal count's."""
    import jax

    rng = np.random.default_rng(7)
    n, m, p = 400, 10, 3
    X = rng.normal(size=(n, m))
    latent = X @ rng.normal(size=(m, 2))
    Y = latent @ rng.normal(size=(2, p)) + 0.05 * rng.normal(size=(n, p))
    X, Y = _zscore(X), _zscore(Y)
    model = pls.fit(jnp.asarray(X[:200]), jnp.asarray(Y[:200]), ncomp=6)
    best = np.asarray(pls.optimal_num_components_vdv(
        model, jnp.asarray(X[200:]), jnp.asarray(Y[200:]),
        jax.random.PRNGKey(0),
    ))
    em = np.asarray(model.cv_new_data(jnp.asarray(X[200:]),
                                      jnp.asarray(Y[200:])))
    argmin = em.argmin(axis=0) + 1
    # vdv picks at most the PRESS-argmin count, and the chosen count's PRESS
    # is close to the minimum
    assert np.all(best >= 1) and np.all(best <= argmin)
    for j, b in enumerate(best):
        assert em[b - 1, j] <= 1.5 * em[:, j].min()
    # degenerate sanity: the argmin count itself always passes (p == 1)
    sq = pls._per_row_sq_errors(model.rotations, model.y_loadings,
                                jnp.asarray(X[200:]), jnp.asarray(Y[200:]))
    pv = np.asarray(pls._vdv_pvalues(sq, jax.random.PRNGKey(1), 99))
    for j in range(p):
        assert pv[argmin[j] - 1, j] == 1.0
