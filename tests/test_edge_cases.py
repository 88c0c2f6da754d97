"""Edge-case sweep: degenerate sizes and shapes through the whole stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.models.parameters import ContinuousUniformPrior, ParameterSet
from abcsmc_tpu.models.simulators import PySimulator, make_dice_simulator
from abcsmc_tpu.ops import pls, ranking, weights
from abcsmc_tpu.storage import MemoryStorage


def test_single_survivor_weight_and_resample():
    """keep=1: mixture has one center; weights must be [1.0]-ish and the
    proposal still works."""
    ps = ParameterSet([ContinuousUniformPrior("x", 0.0, 1.0)])
    prev = jnp.array([[0.5]])
    prev_w = jnp.array([1.0])
    dv = jnp.array([0.01])
    params = jnp.array([[0.5], [0.52], [0.48]])
    w = np.asarray(weights.weight_predictive_prior(
        params, prev, prev_w, dv, ps.prior_log_pdf
    ))
    assert np.all(np.isfinite(w)) and np.linalg.norm(w) == pytest.approx(1.0)

    from abcsmc_tpu.ops import resample
    out = np.asarray(resample.sample_predictive_priors(
        jax.random.PRNGKey(0), 10, prev_w, prev, ps, dv
    ))
    assert out.shape == (10, 1)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_single_metric_pls_ranking():
    """m=1 metric: PLS degenerates to max 1 component but must still rank."""
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 1, (50, 2))
    mets = (theta[:, :1] * 3.0) + 0.01 * rng.normal(size=(50, 1))
    obs = np.array([1.5])
    order, d = ranking.ranking_pls(
        jnp.asarray(mets), jnp.asarray(theta), jnp.asarray(obs), 0.5
    )
    assert np.all(np.isfinite(np.asarray(d)))
    best = np.asarray(order)[0]
    assert abs(theta[best, 0] - 0.5) < 0.15  # 3*theta0 ~ 1.5 -> theta0 ~ 0.5


def test_pls_single_predictor():
    X = jnp.asarray(np.random.default_rng(1).normal(size=(40, 1)))
    Y = X * 2.0 + 0.01 * jnp.asarray(
        np.random.default_rng(2).normal(size=(40, 1))
    )
    model = pls.fit(X, Y)  # max rank 1
    assert model.ncomp == 1
    pred = np.asarray(model.predict(X))
    assert np.corrcoef(pred[:, 0], np.asarray(Y)[:, 0])[0, 1] > 0.99


def test_keep_equals_population():
    """predictive_prior_size == num_samples: everyone survives."""
    cfg = {
        "smc_iterations": 2, "num_samples": 24, "predictive_prior_size": 24,
        "parameters": [
            {"name": "x", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0, "par2": 1},
        ],
        "metrics": [{"name": "m", "num_type": "FLOAT", "value": 0.5}],
    }
    abc = AbcSmc(cfg, simulator=PySimulator(lambda p, s, ser: [p[0]]),
                 storage=MemoryStorage())
    abc.run(seed=2)
    pars, w = abc.posterior()
    assert pars.shape == (24, 1)
    assert np.all(np.isfinite(w))


def test_two_particle_generation():
    """Minimum viable population (n=2, keep=2 to allow variance)."""
    cfg = {
        "smc_iterations": 2, "num_samples": 2, "predictive_prior_size": 2,
        "filter": "SIMPLE",
        "parameters": [
            {"name": "x", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0, "par2": 1},
        ],
        "metrics": [{"name": "m", "num_type": "FLOAT", "value": 0.5}],
    }
    abc = AbcSmc(cfg, simulator=PySimulator(lambda p, s, ser: [p[0]]),
                 storage=MemoryStorage())
    abc.run(seed=4)
    pars, w = abc.posterior()
    assert pars.shape == (2, 1)
    assert np.all(np.isfinite(w))


def test_gaussian_prior_unbounded_noise_always_valid():
    """GaussianPrior support is the whole line: first truncation draw always
    accepts (Priors.h likelihood never 0)."""
    from abcsmc_tpu.models.parameters import GaussianPrior
    ps = ParameterSet([GaussianPrior("g", 0.0, 1.0)])
    mu = jnp.full((64, 1), 100.0)  # far from prior mean: still valid
    out = np.asarray(ps.noise_independent(
        jax.random.PRNGKey(0), mu, jnp.array([1.0])
    ))
    assert np.all(np.isfinite(out))
    assert abs(out.mean() - 100.0) < 1.0  # no prior-mean fallback happened


def test_dice_single_die_sd_zero():
    """dice simulator: a single die has sd 0 (dice.h:36-40 semantics)."""
    sim = make_dice_simulator(max_dice=10)
    mets = sim.run_batch(np.array([[1.0, 6.0]]), np.array([3]), np.array([0]))
    assert mets[0, 1] == 0.0
    assert 1 <= mets[0, 0] <= 6


def test_corrupt_database_file_raises_storage_error(tmp_path):
    """Opening a non-database file must raise the coded StorageError at
    connect time, not leak a raw sqlite3.DatabaseError from whichever query
    happens to run first (the reference's sqdb wrapper throws its own
    Exception at open, lib/sqdb/src/sqdb.cpp)."""
    import pytest

    from abcsmc_tpu.errors import StorageError
    from abcsmc_tpu.storage.sqlite_store import SQLiteStorage

    p = tmp_path / "not_a_db.sqlite"
    p.write_bytes(b"definitely not an sqlite file" * 40)
    with pytest.raises(StorageError, match="cannot open database"):
        SQLiteStorage(str(p))


def test_cli_corrupt_database_returns_error_code(tmp_path, capsys):
    """The CLI surfaces a corrupt/non-database file as a one-line coded
    error (the StorageError path), never a traceback."""
    import json

    from abcsmc_tpu.cli import main

    bad = tmp_path / "corrupt.sqlite"
    bad.write_bytes(b"definitely not an sqlite file" * 40)
    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps({
        "smc_iterations": 1,
        "num_samples": 8,
        "predictive_prior_fraction": 0.5,
        "parameters": [{"name": "x", "dist_type": "UNIFORM",
                        "num_type": "FLOAT", "par1": 0, "par2": 1}],
        "metrics": [{"name": "m", "num_type": "FLOAT", "value": 0.5}],
        "database_filename": str(bad),
    }))
    rc = main([str(cfg_path), "--process"])
    assert rc == 1
    assert "cannot open database" in capsys.readouterr().err


def test_cli_operational_sqlite_error_backstop(tmp_path, capsys, monkeypatch):
    """Mid-run operational sqlite failures (disk I/O, lock timeout past
    busy_timeout) that are not wrapped in AbcError exit with a one-line
    'database error:' message, not a traceback."""
    import json
    import sqlite3

    from abcsmc_tpu import cli as cli_mod
    from abcsmc_tpu.cli import main

    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps({
        "smc_iterations": 1,
        "num_samples": 8,
        "predictive_prior_fraction": 0.5,
        "parameters": [{"name": "x", "dist_type": "UNIFORM",
                        "num_type": "FLOAT", "par1": 0, "par2": 1}],
        "metrics": [{"name": "m", "num_type": "FLOAT", "value": 0.5}],
        "database_filename": str(tmp_path / "ok.sqlite"),
    }))

    def boom(self, seed=0, verbose=False):
        raise sqlite3.OperationalError("disk I/O error")

    monkeypatch.setattr(cli_mod.AbcSmc, "process_database", boom)
    rc = main([str(cfg_path), "--process"])
    assert rc == 1
    assert "database error: disk I/O error" in capsys.readouterr().err
