"""Weight-kernel scaling study (VERDICT r2 item #4): the O(K^2) mixture
denominator at the next scale decade.

Measures on the current backend (one JSON line per measurement):

1. the Pallas mixture kernel at K x K for K in {50k, 200k, 500k}, static-max
   (default) vs online-max modes;
2. a full 10M-particle generation with 500k survivors (sim included and
   excluded) - the README's steady-state scale point;
3. the truncation feasibility check: in a REALISTIC SMC state (queries =
   resample+perturb of the mixture, kernel sd = sqrt(doubled variance)),
   what fraction of mixture components fall within T log-units of each
   query's best logit? If ~100% at T=30, block-skipping truncation cannot
   prune anything - that is the analytic expectation: survivors' scaled
   coordinates have per-dimension variance 1/2 (dv = 2 var by definition),
   so ALL pairwise logits live within ~P log-units of each other.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_weight_kernel.py
       [--skip-10m]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from abcsmc_tpu._cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def sync(r):
    leaf = jax.tree_util.tree_leaves(r)[-1]
    # index before fetching (eager ravel relayouts the whole buffer)
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timeit(f, *a, reps=3):
    sync(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def emit(metric, seconds, **extra):
    print(json.dumps({
        "metric": metric, "value": round(seconds * 1000, 2), "unit": "ms",
        **extra,
    }), flush=True)


def realistic_state(rng, k, p, key):
    """Survivors + doubled variance + queries drawn the way SMC draws them."""
    prev = jnp.asarray(rng.uniform(0.3, 0.7, (k, p)), jnp.float32)
    dv = 2.0 * jnp.var(prev, axis=0, ddof=1)
    w = jnp.asarray(rng.dirichlet(np.full(k, 5.0)), jnp.float32)
    pick = jax.random.choice(key, k, (k,), p=w)
    queries = prev[pick] + jnp.sqrt(dv)[None, :] * jax.random.normal(
        jax.random.fold_in(key, 1), (k, p), jnp.float32
    )
    return prev, dv, w, queries


def main():
    from abcsmc_tpu.ops.weights import _prep_scaled
    from abcsmc_tpu.ops.pallas_kernels import mixture_logsumexp

    backend = jax.default_backend()
    on_cpu = backend == "cpu"
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    p = 6

    # --- 3. truncation feasibility (small scale is representative) ---
    k = 4096
    prev, dv, w, queries = realistic_state(rng, k, p, key)
    a, b, _ = _prep_scaled(queries, prev, dv)
    d2 = (
        jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
        - 2.0 * a @ b.T
    )
    logits = -0.5 * d2 + jnp.log(w)[None, :]
    best = jnp.max(logits, axis=1, keepdims=True)
    for T in (10.0, 30.0):
        frac = float(jnp.mean((logits >= best - T).astype(jnp.float32)))
        print(json.dumps({
            "metric": f"fraction of mixture within {T:g} log-units of each "
                      f"query's best logit (K={k}, realistic SMC state)",
            "value": round(frac, 4), "unit": "fraction",
        }), flush=True)
    spread = float(jnp.mean(best - jnp.min(logits, axis=1, keepdims=True)))
    print(json.dumps({
        "metric": "mean (best - worst) logit spread per query "
                  "(analytic ~P + log-weight spread)",
        "value": round(spread, 2), "unit": "log-units",
    }), flush=True)

    # --- 1. kernel scaling ---
    if on_cpu:
        print(json.dumps({"metric": "pallas kernel timings skipped",
                          "value": None, "unit": "(cpu backend)"}), flush=True)
    else:
        for k in (50_000, 200_000, 500_000):
            prev = jnp.asarray(rng.uniform(0.3, 0.7, (k, p)), jnp.float32)
            w = jnp.full((k,), 1.0 / k, jnp.float32)
            dv = jnp.full((p,), 0.02, jnp.float32)
            a, b, _ = _prep_scaled(prev, prev, dv)
            lw = jnp.log(w)
            for mode in ("auto", "online"):
                t = timeit(
                    lambda: mixture_logsumexp(a, b, lw, mode=mode)
                )
                emit(
                    f"mixture-weight kernel {k}x{k}, mode={mode}", t,
                    logits_per_sec=round(k * k / t),
                )

    # --- 2. the 10M generation ---
    if "--skip-10m" in sys.argv or on_cpu:
        return
    from abcsmc_tpu.config import parse_config
    from abcsmc_tpu.models.parameters import ParameterSet
    from abcsmc_tpu.models.simulators import make_linear_gaussian_simulator
    from abcsmc_tpu.models.transforms import ParameterTransform
    from abcsmc_tpu.parallel.generation import ShardedGeneration
    from abcsmc_tpu.parallel.mesh import particle_mesh

    npar, nmet = 6, 13
    n, keep = 10_000_000, 500_000
    ndev = len(jax.devices())
    n -= n % ndev
    cfg = parse_config({
        "smc_iterations": 2, "num_samples": n,
        "predictive_prior_size": keep,
        "parameters": [
            {"name": f"p{i}", "dist_type": "UNIFORM", "num_type": "FLOAT",
             "par1": 0.0, "par2": 1.0} for i in range(npar)
        ],
        "metrics": [
            {"name": f"m{j}", "num_type": "FLOAT", "value": 0.0}
            for j in range(nmet)
        ],
    })
    params = jnp.asarray(rng.uniform(0, 1, (n, npar)), jnp.float32)
    seeds = jnp.asarray(
        rng.integers(0, 2**31, n, dtype=np.int64).astype(np.uint32)
    )
    mets = jnp.asarray(
        np.asarray(params) @ rng.normal(size=(npar, nmet)).astype(np.float32)
        + 0.3 * rng.normal(size=(n, nmet)).astype(np.float32)
    )
    state = (
        jnp.asarray(rng.uniform(0.3, 0.7, (keep, npar)), jnp.float32),
        jnp.full((keep,), 1.0 / keep, jnp.float32),
        jnp.full((npar,), 0.02, jnp.float32),
    )
    for prec in ("highest", "high"):
        gen = ShardedGeneration(
            ParameterSet.from_specs(cfg.parameters),
            ParameterTransform(cfg.parameters),
            make_linear_gaussian_simulator(npar, nmet), np.zeros(nmet),
            mesh=particle_mesh(), weight_precision=prec,
        )
        t = timeit(
            lambda kk: gen.step_precomputed(kk, params, mets, keep, n, state),
            key,
        )
        emit(f"SMC generation 10M particles, keep 500k (sim excluded, "
             f"weight_precision={prec}), {ndev} chip(s)", t,
             particles_per_sec=round(n / t))
        t = timeit(lambda kk: gen.step(kk, params, seeds, keep, n, state),
                   key)
        emit(f"SMC generation 10M particles, keep 500k (sim included, "
             f"weight_precision={prec}), {ndev} chip(s)", t,
             particles_per_sec=round(n / t))


if __name__ == "__main__":
    main()
