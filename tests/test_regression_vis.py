"""AbcUtil regression helpers + visualization module."""

import os

import numpy as np
import pytest

from abcsmc_tpu.ops.regression import lin_reg, logistic_reg
from abcsmc_tpu.ops import stats


def test_lin_reg_exact_line():
    x = np.arange(10.0)
    y = 3.0 * x + 2.0
    fit = lin_reg(x, y)
    assert fit.m == pytest.approx(3.0)
    assert fit.b == pytest.approx(2.0)
    assert fit.rsq == pytest.approx(1.0)


def test_lin_reg_singular():
    fit = lin_reg([2.0, 2.0, 2.0], [1.0, 2.0, 3.0])
    assert (fit.m, fit.b, fit.rsq) == (0.0, 0.0, 0.0)


def test_lin_reg_noisy_rsq():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 10, 200)
    y = -1.5 * x + 4 + rng.normal(0, 1.0, 200)
    fit = lin_reg(x, y)
    assert fit.m == pytest.approx(-1.5, abs=0.1)
    assert 0.9 < fit.rsq <= 1.0


def test_logistic_reg_recovers_betas():
    rng = np.random.default_rng(1)
    t = np.linspace(-3, 3, 30)
    b0_true, b1_true = 0.5, 1.2
    p = 1 / (1 + np.exp(-(b0_true + b1_true * t)))
    attempts = np.full(30, 500)
    successes = rng.binomial(attempts, p)
    fit = logistic_reg(t, successes, attempts)
    assert fit.status == 0
    assert fit.beta0 == pytest.approx(b0_true, abs=0.15)
    assert fit.beta1 == pytest.approx(b1_true, abs=0.15)


def test_running_stat_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(3, 2, 500)
    rs = stats.RunningStat()
    rs.push(x)
    assert rs.num_data_values() == 500
    assert rs.mean() == pytest.approx(x.mean())
    assert rs.variance() == pytest.approx(x.var(ddof=1))


def test_ranks_and_logit():
    import jax.numpy as jnp
    r = np.asarray(stats.ranks(jnp.array([3.0, 1.0, 2.0])))
    assert list(r) == [2, 0, 1]
    assert float(stats.logit(jnp.array(0.5))) == 0.0
    assert float(stats.logistic(jnp.array(0.0))) == 0.5


def test_vis_produces_plots(tmp_path):
    from abcsmc_tpu.engine import AbcSmc
    from abcsmc_tpu.models.simulators import make_dice_simulator
    from abcsmc_tpu import vis

    db = str(tmp_path / "v.sqlite")
    cfg = {
        "smc_iterations": 2,
        "num_samples": 40,
        "predictive_prior_size": 10,
        "database_filename": db,
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 30},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 30},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
        ],
    }
    AbcSmc(cfg, simulator=make_dice_simulator(max_dice=30)).run(seed=1)

    p1 = vis.plot_posteriors(db, str(tmp_path / "post.png"))
    p2 = vis.plot_pairs(db, str(tmp_path / "pairs.png"))
    assert os.path.getsize(p1) > 10_000
    assert os.path.getsize(p2) > 10_000


def test_vis_refuses_empty_database(tmp_path):
    from abcsmc_tpu import vis
    from abcsmc_tpu.errors import AbcError
    from abcsmc_tpu.storage.sqlite_store import SQLiteStorage

    db = str(tmp_path / "empty.sqlite")
    store = SQLiteStorage(db)
    store.create(["a"], ["m"], has_upar=False)
    store.close()
    with pytest.raises(AbcError, match="no generations"):
        vis.plot_posteriors(db, str(tmp_path / "x.png"))


def test_vis_main_usage_error():
    from abcsmc_tpu import vis

    assert vis.main([]) == 1


def test_cli_vis_flag_standalone(tmp_path):
    """`abcsmc-tpu cfg --vis PREFIX` with no action flags plots an existing
    run database — the built-in replacement for the reference's offline
    vis/abc_plots.R + abc.pairs.ex.R workflow."""
    import json

    from abcsmc_tpu import cli
    from abcsmc_tpu.engine import AbcSmc
    from abcsmc_tpu.models.simulators import make_dice_simulator

    db = str(tmp_path / "v.sqlite")
    cfg = {
        "smc_iterations": 2,
        "num_samples": 40,
        "predictive_prior_size": 10,
        "database_filename": db,
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 30},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 30},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
        ],
    }
    AbcSmc(cfg, simulator=make_dice_simulator(max_dice=30)).run(seed=1)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)

    prefix = str(tmp_path / "out")
    assert cli.main([cfg_path, "--vis", prefix]) == 0
    assert os.path.getsize(f"{prefix}_posteriors.png") > 10_000
    assert os.path.getsize(f"{prefix}_pairs.png") > 10_000

    # missing database surfaces as a clean coded error, not a traceback
    os.remove(db)
    assert cli.main([cfg_path, "--vis", prefix]) != 0
