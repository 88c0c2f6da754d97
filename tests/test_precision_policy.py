"""The package-wide matmul precision policy (docs/DESIGN.md "Precision
policy"): importing abcsmc_tpu sets jax_default_matmul_precision=highest so
covariance/Gram/score matmuls don't silently run at bf16 input rounding on
TPU (measured 4.5e-2 log-density error vs 1.1e-4; docs/TPU_VALIDATION.md).
"""

import os
import subprocess
import sys

import jax


def test_import_sets_highest_matmul_precision():
    import abcsmc_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "highest"


def test_env_override_respected():
    env = dict(os.environ)
    env["ABCSMC_MATMUL_PRECISION"] = "unset"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import abcsmc_tpu, jax; "
         "print(jax.config.jax_default_matmul_precision)"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    # "unset" skips the config update, leaving jax's own default (None)
    assert out.stdout.strip() == "None"
