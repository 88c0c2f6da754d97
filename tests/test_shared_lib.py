"""SharedLibSimulator: a real compiled C shared object through the full SMC
loop (the reference's `shared` binding, AbcSim.h:96-114)."""

import subprocess

import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.errors import SimulatorError
from abcsmc_tpu.models.simulators import SharedLibSimulator


@pytest.fixture(scope="module")
def libdice(tmp_path_factory):
    out = tmp_path_factory.mktemp("solib") / "libdice.so"
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", "-o", str(out),
         "examples/dice_sim.c", "-lm"],
        check=True, cwd="/root/repo",
    )
    return str(out)


def test_shared_lib_run_batch(libdice):
    sim = SharedLibSimulator(libdice, nmet=2)
    params = np.array([[10.0, 6.0], [1.0, 6.0], [100.0, 2.0]])
    mets = sim.run_batch(params, np.array([1, 2, 3]), np.array([0, 1, 2]))
    assert mets.shape == (3, 2)
    assert 10 <= mets[0, 0] <= 60          # 10 dice of 6
    assert mets[1, 1] == 0.0               # single die -> sd 0
    assert 100 <= mets[2, 0] <= 200        # 100 coins
    # deterministic replay from the seed
    again = sim.run_batch(params, np.array([1, 2, 3]), np.array([0, 1, 2]))
    np.testing.assert_array_equal(mets, again)


def test_shared_lib_full_fit(libdice, tmp_path):
    cfg = {
        "smc_iterations": 2,
        "num_samples": 150,
        "predictive_prior_size": 20,
        "shared": libdice,
        "database_filename": str(tmp_path / "so.sqlite"),
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
    abc = AbcSmc(cfg)  # simulator bound from config "shared"
    assert isinstance(abc.simulator, SharedLibSimulator)
    abc.run(seed=6)
    pars, _ = abc.posterior()
    assert pars.shape == (20, 2)
    # tightened vs the U(1,50) prior
    assert pars[:, 1].std() < 15


def test_shared_lib_missing_symbol(tmp_path):
    src = tmp_path / "empty.c"
    src.write_text("int unrelated(void) { return 0; }\n")
    out = tmp_path / "empty.so"
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-o", str(out), str(src)], check=True
    )
    with pytest.raises(SimulatorError):
        SharedLibSimulator(str(out), nmet=2)
