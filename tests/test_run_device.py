"""Engine on-device fast path: fused sharded generations + store mirroring."""

import sqlite3

import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.models.simulators import PySimulator, make_dice_simulator
from abcsmc_tpu.storage import MemoryStorage


def dice_cfg(db=None, n=64):
    cfg = {
        "smc_iterations": 3,
        "num_samples": n,
        "predictive_prior_fraction": 0.25,
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 50},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 50},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
        ],
    }
    if db:
        cfg["database_filename"] = db
    return cfg


def test_run_device_mirrors_reference_schema(tmp_path):
    db = str(tmp_path / "dev.sqlite")
    abc = AbcSmc(dice_cfg(db), simulator=make_dice_simulator(max_dice=50))
    abc.run_device(seed=3)

    conn = sqlite3.connect(db)
    sets = conn.execute(
        "select smcSet, count(*), sum(status='D'), sum(posterior > -1) "
        "from job group by smcSet"
    ).fetchall()
    assert sets == [(0, 64, 64, 16), (1, 64, 64, 16), (2, 64, 64, 16)]
    # seeds stored, params in range
    row = conn.execute(
        "select seed, ndice, sides from par where serial = 0"
    ).fetchone()
    assert int(row[0]) >= 0
    assert 1 <= row[1] <= 50
    conn.close()

    pars, w = abc.posterior()
    assert pars.shape == (16, 2)
    assert np.all(np.isfinite(w))


def test_run_device_converges_like_host():
    abc = AbcSmc(
        dice_cfg(n=512), simulator=make_dice_simulator(max_dice=50),
        storage=MemoryStorage(),
    )
    abc.run_device(seed=11)
    pars, _ = abc.posterior()
    # analytic dice inverse ~ (9.4, 8.4)
    assert abs(pars[:, 0].mean() - 9.4) < 6
    assert abs(pars[:, 1].mean() - 8.4) < 6


def test_run_device_falls_back_for_host_simulator():
    abc = AbcSmc(
        dice_cfg(n=20),
        simulator=PySimulator(lambda p, s, ser: [p[0] * 3.5, p[1] * 0.5]),
        storage=MemoryStorage(),
    )
    abc.run_device(seed=1)  # silently uses the host engine
    pars, _ = abc.posterior()
    assert pars.shape[0] == 5


def test_run_device_resume_via_host_path(tmp_path):
    """A device-run database is a valid checkpoint: the host engine reads it
    and continues (e.g. proposes more generations under a longer config)."""
    db = str(tmp_path / "resume.sqlite")
    abc = AbcSmc(dice_cfg(db), simulator=make_dice_simulator(max_dice=50))
    abc.run_device(seed=5)
    abc.storage.close()

    cfg2 = dice_cfg(db)
    cfg2["smc_iterations"] = 4  # one more generation than the device run
    abc2 = AbcSmc(cfg2, simulator=make_dice_simulator(max_dice=50))
    assert abc2.process_database(seed=6) is True  # proposes set 3
    abc2.simulate_next_particles(n=-1)
    abc2.process_database(seed=7)
    pars, _ = abc2.posterior()
    assert pars.shape == (16, 2)


def test_thirty_generation_soak():
    """The reference's default-scale generation count (30 in its quick-start
    config): weights must stay finite and non-degenerate across a long chain
    of INDEPENDENT-noise generations."""
    cfg = dice_cfg(n=96)
    cfg["smc_iterations"] = 30
    cfg["predictive_prior_fraction"] = 0.25
    abc = AbcSmc(cfg, simulator=make_dice_simulator(max_dice=50),
                 storage=MemoryStorage())
    abc.run_device(seed=30)
    assert len(abc._weights) == 30
    for t in range(30):
        w = abc._weights[t]
        assert np.all(np.isfinite(w)) and w.sum() > 0
    # ESS never collapses to a single particle
    ess = [abc.ess(t) for t in range(30)]
    assert min(ess) > 1.5, ess
    pars, _ = abc.posterior()
    # converged near the analytic inverse after 30 generations
    assert abs(pars[:, 1].mean() - 8.4) < 4


def test_nrmse_early_stopping():
    """'nrmse_tolerance' stops both loops early once the posterior metric
    means match the observed within tolerance."""
    cfg = dice_cfg(n=96)
    cfg["smc_iterations"] = 30
    cfg["nrmse_tolerance"] = 0.3  # loose: reached within a few generations
    abc = AbcSmc(cfg, simulator=make_dice_simulator(max_dice=50),
                 storage=MemoryStorage())
    abc.run_device(seed=13)
    assert 1 <= len(abc._weights) < 30

    abc2 = AbcSmc(cfg, simulator=make_dice_simulator(max_dice=50),
                  storage=MemoryStorage())
    abc2.run(seed=13)
    assert 1 <= len(abc2._weights) < 30
    # early stop must not leave a dangling unsimulated 'Q' generation
    gens = abc2.storage.read_generations()
    assert all(g.complete for g in gens)
    assert len(gens) == len(abc2._weights)
