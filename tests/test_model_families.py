"""Additional model families: Lotka-Volterra (the canonical ABC-SMC benchmark,
Toni et al. 2009) and an SEIR vaccination-campaign model (the reference's
production use-case class)."""

import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.models.simulators import (
    make_lotka_volterra_simulator,
    make_seir_campaign_simulator,
)
from abcsmc_tpu.storage import MemoryStorage


def test_lotka_volterra_metrics_shape_and_dynamics():
    sim = make_lotka_volterra_simulator()
    params = np.array([[1.0, 0.1], [0.5, 0.05]])
    mets = sim.run_batch(params, np.array([1, 2]), np.array([0, 1]))
    assert mets.shape == (2, 16)
    assert np.all(np.isfinite(mets))
    # prey/predator stay in the clipped dynamic range
    assert mets.min() > -5 and mets.max() < 1e4


def test_lotka_volterra_fit_recovers_rates():
    """ABC-SMC on LV: fit (a, b) from one noisy observed trajectory."""
    sim = make_lotka_volterra_simulator()
    truth = np.array([[1.0, 0.1]])
    obs = sim.run_batch(truth, np.array([99]), np.array([0]))[0]
    cfg = {
        "smc_iterations": 4,
        "num_samples": 512,
        "predictive_prior_fraction": 0.1,
        "noise": "MULTIVARIATE",
        "parameters": [
            {"name": "a", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.1, "par2": 3.0},
            {"name": "b", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.01, "par2": 0.5},
        ],
        "metrics": [
            {"name": f"m{j}", "num_type": "FLOAT", "value": float(obs[j])}
            for j in range(16)
        ],
    }
    abc = AbcSmc(cfg, simulator=sim, storage=MemoryStorage())
    abc.run_device(seed=21)
    pars, w = abc.posterior()
    w = w / w.sum()
    a_hat = float((pars[:, 0] * w).sum())
    b_hat = float((pars[:, 1] * w).sum())
    assert abs(a_hat - 1.0) < 0.5, a_hat
    assert abs(b_hat - 0.1) < 0.08, b_hat


def test_seir_campaign_metrics():
    sim = make_seir_campaign_simulator(population=20_000, t_steps=200)
    # beta, incubation, gamma, vax start frac, vax rate
    params = np.array([
        [0.4, 0.2, 0.1, 0.25, 0.01],
        [0.4, 0.2, 0.1, 1.00, 0.00],   # no campaign
    ])
    mets = sim.run_batch(params, np.array([5, 5]), np.array([0, 1]))
    assert mets.shape == (2, 8)
    assert np.all(np.isfinite(mets))
    # a campaign reduces the final size vs no campaign (same seed/dynamics)
    assert mets[0, 0] <= mets[1, 0] * 1.05
    # metric sanity: final size >= peak prevalence
    assert mets[0, 0] >= mets[0, 1]


def test_ricker_metrics_and_regimes():
    """Ricker map (Wood 2010): summary statistics are finite, and the
    chaotic high-r regime produces more volatile series than the stable
    low-r regime."""
    from abcsmc_tpu.models.simulators import make_ricker_simulator

    sim = make_ricker_simulator()
    # (log_r, sigma, phi): stable vs chaotic growth
    params = np.array([[1.0, 0.3, 10.0], [3.8, 0.3, 10.0]])
    mets = sim.run_batch(params, np.array([5, 5]), np.array([0, 1]))
    assert mets.shape == (2, 6)
    assert np.all(np.isfinite(mets))
    assert mets[1, 1] > mets[0, 1]          # chaotic regime: larger sd
    assert mets[1, 4] >= mets[0, 4]         # ... and at least as many zeros
    # deterministic replay
    again = sim.run_batch(params, np.array([5, 5]), np.array([0, 1]))
    np.testing.assert_array_equal(mets, again)


def test_gk_fit_recovers_location_scale():
    """g-and-k (Rayner & MacGillivray 2002): ABC-SMC recovers A and B from
    octile summaries of one observed sample."""
    from abcsmc_tpu.models.simulators import make_gk_simulator

    sim = make_gk_simulator()
    truth = np.array([[3.0, 1.0, 2.0, 0.5]])
    obs = sim.run_batch(truth, np.array([123]), np.array([0]))[0]
    cfg = {
        "smc_iterations": 4,
        "num_samples": 512,
        "predictive_prior_fraction": 0.1,
        "parameters": [
            {"name": "A", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 10.0},
            {"name": "B", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.1, "par2": 5.0},
            {"name": "g", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 5.0},
            {"name": "k", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": -0.2, "par2": 2.0},
        ],
        "metrics": [
            {"name": f"q{j}", "num_type": "FLOAT", "value": float(obs[j])}
            for j in range(8)
        ],
    }
    abc = AbcSmc(cfg, simulator=sim, storage=MemoryStorage())
    abc.run_device(seed=8)
    pars, w = abc.posterior()
    w = w / w.sum()
    a_hat = float((pars[:, 0] * w).sum())
    b_hat = float((pars[:, 1] * w).sum())
    assert abs(a_hat - 3.0) < 1.0, a_hat
    assert abs(b_hat - 1.0) < 0.8, b_hat


def test_mg1_departure_closed_form_matches_recursion():
    """The scan-free cummax formulation equals the textbook sequential
    recursion d_i = s_i + max(a_i, d_{i-1}) (Fearnhead & Prangle 2012)."""
    import jax.numpy as jnp
    from abcsmc_tpu.models.simulators import mg1_departure_times

    rng = np.random.default_rng(7)
    for _ in range(5):
        n = 64
        a = np.cumsum(rng.exponential(2.0, n))
        s = rng.uniform(0.5, 4.0, n)
        d_ref = np.empty(n)
        prev = 0.0
        for i in range(n):
            prev = s[i] + max(a[i], prev)
            d_ref[i] = prev
        d = np.asarray(mg1_departure_times(jnp.asarray(a), jnp.asarray(s)))
        np.testing.assert_allclose(d, d_ref, rtol=1e-12)


def test_mg1_metrics_sane_and_replayable():
    from abcsmc_tpu.models.simulators import make_mg1_simulator

    sim = make_mg1_simulator()
    params = np.array([[1.0, 5.0, 0.2], [0.1, 0.2, 2.0]])
    mets = sim.run_batch(params, np.array([3, 4]), np.array([0, 1]))
    assert mets.shape == (2, 8)
    assert np.all(np.isfinite(mets))
    # octiles are sorted and positive (inter-departure times are positive)
    assert np.all(mets[:, :7] > 0)
    assert np.all(np.diff(mets[:, :7], axis=1) >= 0)
    # heavy service (mean 3, utilisation ~0.6) has longer inter-departures
    # than the fast queue (service mean 0.15)
    assert mets[0, 7] > mets[1, 7]
    again = sim.run_batch(params, np.array([3, 4]), np.array([0, 1]))
    np.testing.assert_array_equal(mets, again)


def test_ma2_autocovariances_match_analytic():
    """MA(2): sample autocovariances converge to g0 = 1 + t1^2 + t2^2,
    g1 = t1 (1 + t2), g2 = t2 (Marin et al. 2012)."""
    from abcsmc_tpu.models.simulators import make_ma2_simulator

    t1, t2 = 0.6, 0.2
    sim = make_ma2_simulator(n_obs=200_000)
    mets = sim.run_batch(
        np.array([[t1, t2]]), np.array([11]), np.array([0])
    )[0]
    np.testing.assert_allclose(
        mets,
        [1 + t1**2 + t2**2, t1 * (1 + t2), t2],
        atol=0.03,
    )


def test_ma2_fit_recovers_thetas():
    """ABC-SMC on MA(2) over the invertibility box recovers (t1, t2)."""
    from abcsmc_tpu.models.simulators import make_ma2_simulator

    sim = make_ma2_simulator(n_obs=500)
    truth = np.array([[0.6, 0.2]])
    obs = sim.run_batch(truth, np.array([42]), np.array([0]))[0]
    cfg = {
        "smc_iterations": 4,
        "num_samples": 512,
        "predictive_prior_fraction": 0.1,
        "parameters": [
            {"name": "t1", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": -2.0, "par2": 2.0},
            {"name": "t2", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": -1.0, "par2": 1.0},
        ],
        "metrics": [
            {"name": f"g{j}", "num_type": "FLOAT", "value": float(obs[j])}
            for j in range(3)
        ],
    }
    abc = AbcSmc(cfg, simulator=sim, storage=MemoryStorage())
    abc.run_device(seed=5)
    pars, w = abc.posterior()
    w = w / w.sum()
    t1_hat = float((pars[:, 0] * w).sum())
    t2_hat = float((pars[:, 1] * w).sum())
    assert abs(t1_hat - 0.6) < 0.25, t1_hat
    assert abs(t2_hat - 0.2) < 0.25, t2_hat


def test_new_builtins_resolve_from_config():
    from abcsmc_tpu.config import parse_config
    from abcsmc_tpu.models.simulators import resolve_simulator

    for name, npar, nmet in (
        ("ricker", 3, 6), ("gk", 4, 8), ("mg1", 3, 8), ("ma2", 2, 3)
    ):
        cfg = parse_config({
            "smc_iterations": 1, "num_samples": 8,
            "predictive_prior_size": 2,
            "simulator": name,
            "parameters": [
                {"name": f"p{i}", "dist_type": "UNIFORM",
                 "num_type": "FLOAT", "par1": 0.0, "par2": 1.0}
                for i in range(npar)
            ],
            "metrics": [
                {"name": f"m{j}", "num_type": "FLOAT", "value": 0.1}
                for j in range(nmet)
            ],
        })
        sim = resolve_simulator(cfg)
        assert sim is not None and sim.nmet == nmet
