"""Config-surface fuzz: every malformed input must surface as AbcError.

The reference exits with coded errors from parse_config (-201..-214,
/root/reference/src/AbcSmc.cpp:54-430); the library contract here is that any
garbage a user can type into a config JSON raises ``AbcError`` (usually
``ConfigError``) with a readable message — never a raw ``KeyError`` /
``TypeError`` / ``AttributeError`` / ``IndexError`` escaping the parser's
internals. A deterministic mutation fuzz over a known-good config pins that:
type-flip every field, delete every key, and inject adversarial values.
"""

import copy
import json

import pytest

from abcsmc_tpu.config import parse_config
from abcsmc_tpu.errors import AbcError

GOOD = {
    "smc_iterations": 3,
    "num_samples": [60, 80],
    "predictive_prior_fraction": 0.2,
    "pls_training_fraction": 0.5,
    "noise": "INDEPENDENT",
    "database_filename": "/tmp/fuzz.sqlite",
    "parameters": [
        {"name": "a", "dist_type": "UNIFORM", "num_type": "INT",
         "par1": 1, "par2": 100},
        {"name": "b", "dist_type": "NORMAL", "num_type": "FLOAT",
         "par1": 0.0, "par2": 1.0,
         "untransform": "POW_10"},
        {"name": "c", "dist_type": "PSEUDO", "num_type": "FLOAT",
         "vals": [0.1, 0.2]},
    ],
    "metrics": [
        {"name": "m1", "num_type": "INT", "value": 44},
        {"name": "m2", "num_type": "FLOAT", "value": 2.39925},
    ],
}

# values chosen to stress typing, bounds, and container assumptions
ADVERSARIAL = [
    None, True, -1, 0, 1.5, "garbage", [], {}, [[]], {"x": 1},
    float("nan"), float("inf"), "", [None], -(10 ** 30),
]


def _assert_parses_or_abc_error(cfg, note):
    try:
        parse_config(cfg)
    except AbcError:
        pass  # the contract: coded, readable, catchable
    except (RecursionError, MemoryError):
        raise
    except Exception as e:  # noqa: BLE001 - the point of the test
        pytest.fail(f"{note}: leaked internal {type(e).__name__}: {e}")


def test_good_config_parses():
    cfg = parse_config(copy.deepcopy(GOOD))
    assert cfg.num_smc_sets == 3
    assert len(cfg.parameters) == 3 and len(cfg.metrics) == 2


def test_type_flip_every_toplevel_value():
    for key in GOOD:
        for bad in ADVERSARIAL:
            cfg = copy.deepcopy(GOOD)
            cfg[key] = bad
            _assert_parses_or_abc_error(cfg, f"{key}={bad!r}")


def test_delete_every_toplevel_key():
    for key in GOOD:
        cfg = copy.deepcopy(GOOD)
        del cfg[key]
        _assert_parses_or_abc_error(cfg, f"del {key}")


def test_type_flip_every_parameter_field():
    for i, par in enumerate(GOOD["parameters"]):
        for field in par:
            for bad in ADVERSARIAL:
                cfg = copy.deepcopy(GOOD)
                cfg["parameters"][i][field] = bad
                _assert_parses_or_abc_error(
                    cfg, f"parameters[{i}].{field}={bad!r}"
                )
            cfg = copy.deepcopy(GOOD)
            del cfg["parameters"][i][field]
            _assert_parses_or_abc_error(cfg, f"del parameters[{i}].{field}")


def test_type_flip_every_metric_field():
    for i, met in enumerate(GOOD["metrics"]):
        for field in met:
            for bad in ADVERSARIAL:
                cfg = copy.deepcopy(GOOD)
                cfg["metrics"][i][field] = bad
                _assert_parses_or_abc_error(cfg, f"metrics[{i}].{field}={bad!r}")
            cfg = copy.deepcopy(GOOD)
            del cfg["metrics"][i][field]
            _assert_parses_or_abc_error(cfg, f"del metrics[{i}].{field}")


def test_untransform_spec_mutations():
    for bad in ADVERSARIAL + [{"type": "NOPE"}, {"type": None}]:
        cfg = copy.deepcopy(GOOD)
        cfg["parameters"][1]["untransform"] = bad
        _assert_parses_or_abc_error(cfg, f"untransform={bad!r}")


def test_adversarial_whole_documents(tmp_path):
    for bad in ADVERSARIAL:
        if isinstance(bad, str):
            continue  # strings are treated as file paths by parse_config
        _assert_parses_or_abc_error(bad, f"document={bad!r}")
    # malformed JSON text on disk (same error class as jsoncpp parse failure)
    p = tmp_path / "broken.json"
    p.write_text("{not json")
    _assert_parses_or_abc_error(str(p), "malformed json file")
    # valid JSON, non-object document
    p2 = tmp_path / "arr.json"
    p2.write_text(json.dumps([1, 2, 3]))
    _assert_parses_or_abc_error(str(p2), "non-object json document")
