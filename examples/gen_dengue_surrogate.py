"""Generate the dengue-class surrogate config (16 params x 100 metrics,
100k particles/gen): observed metrics come from the linear_gaussian builtin
at a known truth vector, so the fit has a verifiable target.

    python examples/gen_dengue_surrogate.py > examples/dengue_surrogate.json
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NPAR, NMET = 16, 100


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from abcsmc_tpu.models.simulators import make_linear_gaussian_simulator

    rng = np.random.default_rng(42)
    truth = rng.uniform(0.2, 0.8, NPAR)
    sim = make_linear_gaussian_simulator(NPAR, NMET)
    obs = sim.run_batch(truth[None, :], np.array([2024]), np.array([0]))[0]

    cfg = {
        "comment": (
            "Dengue-campaign-style surrogate scale test: 16 params, "
            "100 metrics, 100k particles/gen; observed metrics generated "
            f"from truth={np.round(truth, 3).tolist()} (seed 42). "
            "Run with --device."
        ),
        "smc_iterations": 5,
        "num_samples": 102400,
        "predictive_prior_fraction": 0.02,
        "pls_training_fraction": 0.5,
        "noise": "INDEPENDENT",
        "simulator": "linear_gaussian",
        "database_filename": "dengue_surrogate.sqlite",
        "parameters": [
            {"name": f"p{i}", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 1.0}
            for i in range(NPAR)
        ],
        "metrics": [
            {"name": f"m{j}", "num_type": "FLOAT", "value": round(float(obs[j]), 6)}
            for j in range(NMET)
        ],
    }
    json.dump(cfg, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
