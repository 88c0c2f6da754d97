"""Every shipped example config must parse and resolve its simulator."""

import glob
import json

import pytest

from abcsmc_tpu.config import parse_config
from abcsmc_tpu.models.simulators import resolve_simulator

CONFIGS = sorted(glob.glob("/root/repo/examples/*.json"))


def test_examples_exist():
    names = {c.rsplit("/", 1)[1] for c in CONFIGS}
    assert {"dice.json", "gaussian.json", "sir.json", "pseudo.json",
            "dengue_surrogate.json"} <= names


@pytest.mark.parametrize("path", CONFIGS)
def test_example_parses_and_binds(path):
    cfg = parse_config(path)
    assert cfg.npar >= 1 and cfg.nmet >= 1
    sim = resolve_simulator(cfg)
    assert sim is not None
    # set sizes and pred-prior sizes are consistent
    for t in range(min(cfg.num_smc_sets, 3)):
        assert cfg.smc_size_at(t) >= 1
        if not cfg.projection_mode:
            assert 1 <= cfg.pred_prior_size_at(t) <= cfg.smc_size_at(t)


def test_reference_configs_still_parse():
    for path in ("/root/reference/examples/reference.json",
                 "/root/reference/examples/pseudo/config.json"):
        cfg = parse_config(path)
        assert cfg.npar == 2
