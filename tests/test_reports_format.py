"""Report format snapshot: the convergence / filtering reports must keep the
AbcLog layout (src/AbcLog.cpp:24-124) so reference users can eyeball-diff."""

import io

import numpy as np

from abcsmc_tpu.engine import AbcSmc
from abcsmc_tpu import reports
from abcsmc_tpu.models.simulators import make_dice_simulator
from abcsmc_tpu.storage import MemoryStorage


def run_small():
    cfg = {
        "smc_iterations": 2, "num_samples": 60, "predictive_prior_size": 12,
        "parameters": [
            {"name": "number of dice", "short_name": "ndice",
             "dist_type": "UNIFORM", "num_type": "INT", "par1": 1, "par2": 40},
            {"name": "number of sides", "short_name": "sides",
             "dist_type": "UNIFORM", "num_type": "INT", "par1": 1, "par2": 40},
        ],
        "metrics": [
            {"name": "sum", "num_type": "INT", "value": 44},
            {"name": "sd", "num_type": "FLOAT", "value": 2.39925},
        ],
    }
    abc = AbcSmc(cfg, simulator=make_dice_simulator(max_dice=40),
                 storage=MemoryStorage())
    abc.run(seed=3)
    return abc


def test_filtering_report_structure():
    abc = run_small()
    buf = io.StringIO()
    surv = abc._predictive_prior[1]
    reports.filtering_report(
        abc, 1, abc._particle_parameters[1][surv],
        abc._particle_metrics[1][surv], os_=buf,
    )
    text = buf.getvalue()
    lines = text.splitlines()
    # AbcLog.cpp:81-124 section ordering
    assert lines[0].startswith("=" * 20)
    assert lines[1] == "Set 1"
    assert "Observed:" in text
    assert "Normalized RMSE for metric means (lower is better):" in text
    for section in ("Posterior means:", "Posterior medians:", "Best five:",
                    "Worst five:"):
        assert section in text
    # header rows: par short names then ' | ' then metric short names
    hdr = [ln for ln in lines if "ndice" in ln and "sum" in ln][0]
    assert hdr.index("ndice") < hdr.index("sides") < hdr.index("|")
    assert hdr.index("|") < hdr.index("sum") < hdr.index("sd")
    # observed row carries the metric values after the '---' placeholders
    obs_line = [ln for ln in lines if "---" in ln][0]
    assert "44" in obs_line and "2.39925" in obs_line


def test_convergence_report_structure():
    abc = run_small()
    buf = io.StringIO()
    reports.report_convergence_data(abc, 1, os_=buf)
    text = buf.getvalue()
    assert "Convergence data for predictive priors:" in text
    assert 'Par 0: "number of dice"' in text
    assert 'Par 1: "number of sides"' in text
    # AbcLog.cpp:24-79 stanza layout
    assert text.count("Means:") == 2
    assert text.count("Standard deviations:") == 2
    assert text.count("Prior, current  ( delta, % ):") == 4
    assert text.count("Last,  current  ( delta, % ):") == 4

    # set 0 variant announces itself differently (AbcLog.cpp:44-48)
    buf0 = io.StringIO()
    reports.report_convergence_data(abc, 0, os_=buf0)
    assert "Predictive prior summary statistics:" in buf0.getvalue()
