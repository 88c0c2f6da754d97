"""Fixed-seed golden-run regression test (BASELINE.md: 'fixed-seed golden runs
for bit-stability within the new engine'). The exact values below were produced
by this engine on the CPU backend with x64; any numerical change to sampling,
ranking, weighting, or proposal order shows up here.

Regenerated when the default perturbation switched from the rejection loop to
the (distribution-identical) one-pass inverse-CDF truncated normal - the draw
sequence differs even though the sampled law does not."""

import numpy as np
import pytest

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu.models.simulators import make_dice_simulator
from abcsmc_tpu.storage import MemoryStorage

GOLDEN_MEAN = [14.15, 8.325]
GOLDEN_STD = [7.90743321185832, 3.3195443964496096]
GOLDEN_W3 = [0.1065215105771975, 0.09873741872133965, 0.10491078613862397]
GOLDEN_DV = [128.2615384615385, 22.60384615384616]


def test_fixed_seed_dice_run_is_stable():
    cfg = {
        "smc_iterations": 3, "num_samples": 200,
        "predictive_prior_size": 40, "noise": "INDEPENDENT",
        "parameters": [
            {"name": "ndice", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 100},
            {"name": "sides", "dist_type": "UNIFORM", "num_type": "INT",
             "par1": 1, "par2": 100},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
        ],
    }
    abc = AbcSmc(
        cfg, simulator=make_dice_simulator(max_dice=100),
        storage=MemoryStorage(),
    ).run(seed=12345)
    pars, w = abc.posterior()
    np.testing.assert_allclose(pars.mean(axis=0), GOLDEN_MEAN, rtol=1e-12)
    np.testing.assert_allclose(pars.std(axis=0), GOLDEN_STD, rtol=1e-12)
    np.testing.assert_allclose(w[:3], GOLDEN_W3, rtol=1e-9)
    np.testing.assert_allclose(
        abc._doubled_variance[-1], GOLDEN_DV, rtol=1e-12
    )
