"""End-to-end fit at the reference's production workload shape.

The reference's dengue-class fits run 10k particles/generation for ~10
generations over 6 params x 13 metrics with predictive-prior fraction 0.01
(/root/reference/examples/scratch/resume_config.json:2-5,
/root/reference/vis/abc_plots.R:12-14, BASELINE.md "Reference workload
shape") — farmed out to a cluster as SLURM/Torque worker arrays
(/root/reference/examples/scratch/torque_simple.qsub:10-18), where the
orchestration alone (claim/writeback/rank/weight over SQLite) spans hours
and the simulations "many processor-core years".

This tool times the WHOLE fit (10 generations: simulate + rank + PLS +
weight + resample + perturb + store mirroring) on one chip with a
linear-Gaussian surrogate standing in for the epi simulator, so the number
is the framework's end-to-end floor: what's left once your simulator is a
device function. Prints one JSON line per run (cold = includes compile,
warm = persistent-cache hit) plus a truth-recovery check.

Run:  python tools/bench_reference_shape.py [n_particles] [generations]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abcsmc_tpu._cache import enable_persistent_cache

enable_persistent_cache()


def build_cfg(n: int, gens: int, obs: np.ndarray) -> dict:
    return {
        "smc_iterations": gens,
        "num_samples": n,
        "predictive_prior_fraction": 0.01,
        "pls_training_fraction": 0.5,
        "noise": "INDEPENDENT",
        "parameters": [
            {"name": f"p{i}", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 1.0}
            for i in range(6)
        ],
        "metrics": [
            {"name": f"m{j}", "num_type": "FLOAT", "value": float(obs[j])}
            for j in range(13)
        ],
    }


def one_fit(cfg: dict, sim, seed: int) -> tuple[float, "AbcSmc"]:
    from abcsmc_tpu.engine import AbcSmc
    from abcsmc_tpu.storage import MemoryStorage

    abc = AbcSmc(cfg, simulator=sim, storage=MemoryStorage())
    t0 = time.perf_counter()
    abc.run_device(seed=seed)
    wall = time.perf_counter() - t0
    return wall, abc


def main(n: int = 10_000, gens: int = 10) -> None:
    import jax

    from abcsmc_tpu.models.simulators import make_linear_gaussian_simulator

    rng = np.random.default_rng(42)
    truth = rng.uniform(0.2, 0.8, 6)
    sim = make_linear_gaussian_simulator(6, 13, noise_sd=0.1)
    obs = sim.run_batch(truth[None, :], np.array([7]), np.array([0]))[0]
    cfg = build_cfg(n, gens, np.asarray(obs))

    backend = jax.default_backend()
    for label, seed in (("cold", 11), ("warm", 11)):
        wall, abc = one_fit(cfg, sim, seed)
        pars, w = abc.posterior()
        w = w / w.sum()
        err = float(np.abs((pars * w[:, None]).sum(0) - truth).max())
        ncomps = [t.get("ncomp_used") for t in abc.timings
                  if "ncomp_used" in t]
        print(json.dumps({
            "metric": (
                f"reference-shape fit, {n} particles x {gens} generations "
                f"(6 pars x 13 mets, keep 1%), end-to-end incl. store "
                f"mirroring, {label}"
            ),
            "value": round(wall, 3), "unit": "s", "backend": backend,
            "per_generation_ms": round(1e3 * wall / gens, 1),
            "max_abs_posterior_err": round(err, 4),
            "ncomp_used": ncomps,
        }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
