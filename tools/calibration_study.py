"""Simulation-based calibration (SBC) study of the ABC-SMC-PLS posterior.

Truth-recovery tests (tests/test_engine_e2e.py, tools/tpu_stat_validate.py)
show the posterior concentrates near the generating parameters; this tool
measures the sharper property: ACROSS replicates with truths drawn from the
prior, is the posterior *calibrated*?  For each replicate r:

    theta*_r ~ prior;  y_r = simulator(theta*_r);  fit -> posterior_r

then (Talts et al. 2018, "Validating Bayesian inference algorithms with
simulation-based calibration") the posterior CDF evaluated at the truth,
u_rp = P_posterior_r(theta_p <= theta*_rp), is U(0,1) for exact Bayesian
inference. ABC-SMC posteriors are intentionally broadened (the accepted set
is a kernel-smoothed neighborhood of the data, and the perturbation kernel
doubles the survivor variance), so the honest expectation is mild
OVER-dispersion: central-interval coverage at or above nominal, u-values
pulled toward 0.5. This tool quantifies exactly how far, which is the
number a practitioner needs when reading credible intervals from a fit
(the reference ships no such diagnostic).

Reported per parameter: empirical central 50%/90% interval coverage (with
binomial sampling sd), the Kolmogorov-Smirnov distance of {u_rp} from
U(0,1), and the mean |posterior mean - truth|. Appends a section to
docs/CALIBRATION.md.

Run:  python tools/calibration_study.py [replicates] [n_particles]
(any backend; each replicate re-traces the fused step for its observed
vector, so the CPU mesh is the practical default - the f32 TPU pipeline's
agreement with the CPU path is validated separately in
docs/TPU_VALIDATION.md).
"""

from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "CALIBRATION.md",
)

NPAR, NMET = 6, 13
GENS = 6


def one_fit(sim, obs, n, seed):
    """Returns the fitted AbcSmc engine (posterior + summary surfaces)."""
    from abcsmc_tpu.engine import AbcSmc
    from abcsmc_tpu.storage import MemoryStorage

    cfg = {
        "smc_iterations": GENS, "num_samples": n,
        "predictive_prior_fraction": 0.1, "noise": "INDEPENDENT",
        "parameters": [
            {"name": f"p{i}", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 1.0} for i in range(NPAR)
        ],
        "metrics": [
            {"name": f"m{j}", "num_type": "FLOAT", "value": float(obs[j])}
            for j in range(NMET)
        ],
    }
    abc = AbcSmc(cfg, simulator=sim, storage=MemoryStorage())
    abc.run_device(seed=seed, verbose=False)
    return abc


def main(reps: int = 32, n: int = 4096) -> None:
    import jax

    from abcsmc_tpu.models.simulators import make_linear_gaussian_simulator

    rng = np.random.default_rng(20260817)
    sim = make_linear_gaussian_simulator(NPAR, NMET, noise_sd=0.1)

    u_vals = np.zeros((reps, NPAR))
    cov50 = np.zeros((reps, NPAR), bool)
    cov90 = np.zeros((reps, NPAR), bool)
    mean_err = np.zeros((reps, NPAR))
    for r in range(reps):
        # truths MUST come from the exact prior (U(0, 1) here) or the
        # u ~ U(0,1) premise of SBC breaks: truncating the truth range
        # makes even an exactly calibrated posterior read as conservative
        truth = rng.uniform(0.0, 1.0, NPAR)
        obs = np.asarray(sim.run_batch(
            truth[None, :], np.array([1000 + r]), np.array([0])
        )[0])
        abc = one_fit(sim, obs, n, seed=31 * r + 7)
        pars, w = abc.posterior()
        w = np.asarray(w, float)
        w /= w.sum()
        pars = np.asarray(pars, float)
        # interval endpoints come from the ENGINE's own quantile rule
        # (posterior_summary, inverse-CDF over the weight distribution), so
        # the coverage numbers certify the intervals practitioners read
        summ = abc.posterior_summary(quantiles=(0.05, 0.25, 0.75, 0.95))
        for p, (name, s) in enumerate(summ.items()):
            x = pars[:, p]
            u_vals[r, p] = float(w[x <= truth[p]].sum())
            qs = s["quantiles"]
            cov50[r, p] = qs[0.25] <= truth[p] <= qs[0.75]
            cov90[r, p] = qs[0.05] <= truth[p] <= qs[0.95]
            mean_err[r, p] = abs(s["mean"] - truth[p])
        print(f"replicate {r + 1}/{reps}: "
              f"cov90 {cov90[: r + 1].mean():.3f} "
              f"cov50 {cov50[: r + 1].mean():.3f}", flush=True)

    def ks_uniform(u):
        u = np.sort(u)
        k = len(u)
        grid = (np.arange(1, k + 1)) / k
        return float(np.max(np.maximum(np.abs(grid - u),
                                       np.abs(u - (np.arange(k) / k)))))

    lines = [
        "",
        f"## {datetime.datetime.now(datetime.timezone.utc).isoformat()} - "
        f"SBC calibration study, backend={jax.default_backend()} "
        f"({len(jax.devices())} device(s))",
        "",
        f"{reps} replicates x {n} particles x {GENS} generations, "
        f"{NPAR} params x {NMET} metrics (linear-Gaussian device simulator, "
        f"truths ~ the exact U(0, 1) prior, keep 10%; intervals from the "
        f"engine's own posterior_summary quantile rule).",
        "",
        "| param | cov50 (nominal 0.50) | cov90 (nominal 0.90) | "
        "KS(u, U(0,1)) | mean abs err |",
        "|---|---|---|---|---|",
    ]
    sd50 = np.sqrt(0.5 * 0.5 / reps)
    sd90 = np.sqrt(0.9 * 0.1 / reps)
    for p in range(NPAR):
        lines.append(
            f"| p{p} | {cov50[:, p].mean():.3f} +- {sd50:.3f} "
            f"| {cov90[:, p].mean():.3f} +- {sd90:.3f} "
            f"| {ks_uniform(u_vals[:, p]):.3f} "
            f"| {mean_err[:, p].mean():.4f} |"
        )
    lines += [
        "",
        f"All params pooled: cov50 = {cov50.mean():.3f}, "
        f"cov90 = {cov90.mean():.3f}, "
        f"KS = {ks_uniform(u_vals.ravel()):.3f} "
        f"(binomial sd over {reps * NPAR} pooled draws: "
        f"{np.sqrt(0.09 / (reps * NPAR)):.3f} at 90%).",
        "",
    ]
    summary = {
        "cov50": round(float(cov50.mean()), 3),
        "cov90": round(float(cov90.mean()), 3),
        "ks_pooled": round(ks_uniform(u_vals.ravel()), 3),
        "mean_abs_err": round(float(mean_err.mean()), 4),
    }
    print(json.dumps(summary), flush=True)
    with open(LOG, "a") as fh:
        fh.write("\n".join(lines))
    print(f"appended to {LOG}", flush=True)


if __name__ == "__main__":
    if os.environ.get("ABCSMC_FORCE_CPU") == "1":
        # the axon sitecustomize latches the TPU platform before env vars
        # can; this is the in-Python escape hatch (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    main(*(int(a) for a in sys.argv[1:3]))
