"""On-hardware validation: the Pallas mixture-weight kernel vs the XLA
streaming path on the real TPU (VERDICT r1 item 8 - the f32 Pallas lowering
had only ever been validated in interpret mode on CPU).

Runs (TPU only; refuses on CPU so it can't produce a fake artifact):
  1. pallas-vs-xla agreement for mixture_logsumexp at several (N, M, P)
     shapes, f32, reporting max |abs| and relative error,
  2. timing of both paths (speed-of-light check for the hot kernel),
  3. one fused sharded generation at the north-star shape as a smoke.

Appends a markdown log to docs/TPU_VALIDATION.md. Run:
    python tools/tpu_validate.py
"""

from __future__ import annotations

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from abcsmc_tpu._cache import enable_persistent_cache

enable_persistent_cache()

LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "TPU_VALIDATION.md",
)


def sync(x):
    # index before fetching (eager ravel relayouts the whole buffer)
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(f, *a, reps=3):
    sync(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    backend = jax.default_backend()
    assert backend != "cpu", (
        "tpu_validate must run on the accelerator; backend is cpu"
    )
    dev = jax.devices()[0]
    lines = [
        "",
        f"## {datetime.datetime.now(datetime.timezone.utc).isoformat()} - "
        f"backend={backend} device={dev.device_kind}",
        "",
        "| shape (N x M x P) | max abs diff | max rel diff | pallas ms | "
        "xla ms | speedup | split-bf16 max abs |",
        "|---|---|---|---|---|---|---|",
    ]

    from abcsmc_tpu.ops.pallas_kernels import mixture_logsumexp
    from abcsmc_tpu.ops.weights import (
        _log_kernel_mixture_density_xla,
        _prep_scaled,
    )

    rng = np.random.default_rng(0)
    for n, m, p in [(10_000, 5_000, 6), (50_000, 50_000, 6),
                    (200_000, 50_000, 13), (1_000_000, 50_000, 6)]:
        params = jnp.asarray(rng.uniform(0, 1, (n, p)), jnp.float32)
        prev = jnp.asarray(rng.uniform(0.3, 0.7, (m, p)), jnp.float32)
        w = rng.uniform(0.5, 1.5, m).astype(np.float32)
        w /= w.sum()
        lw = jnp.asarray(np.log(w))
        dv = jnp.asarray(rng.uniform(0.01, 0.05, p), jnp.float32)

        a, b, log_norm = _prep_scaled(params, prev, dv)

        def pallas_fn():
            return mixture_logsumexp(a, b, lw) + log_norm

        def xla_fn():
            return _log_kernel_mixture_density_xla(params, prev, lw, dv)

        got = np.asarray(pallas_fn())
        want = np.asarray(xla_fn())
        # the split-bf16 production default (ShardedGeneration
        # weight_precision="high"; lane-packed 3-way split => full-f32-class
        # ~1e-5 nats for p <= 19, 3-pass 2-way fallback ~2e-4 above) must
        # hold on hardware too
        got_high = np.asarray(
            mixture_logsumexp(a, b, lw, precision="high") + log_norm
        )
        high_diff = float(np.max(np.abs(got_high - want)))
        assert high_diff < 2e-3, (
            f"split-bf16 kernel drift at {n}x{m}x{p}: {high_diff}"
        )
        abs_diff = float(np.max(np.abs(got - want)))
        # log-densities cross zero, so a raw relative error blows up on the
        # handful of values near 0; floor the denominator at 1 (i.e. report
        # max(abs err, rel err) per element - the standard log-scale metric)
        rel_diff = float(
            np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
        )
        t_pallas = timeit(pallas_fn)
        t_xla = timeit(xla_fn)
        lines.append(
            f"| {n} x {m} x {p} | {abs_diff:.3e} | {rel_diff:.3e} | "
            f"{t_pallas * 1e3:.2f} | {t_xla * 1e3:.2f} | "
            f"{t_xla / t_pallas:.2f}x | {high_diff:.3e} |"
        )
        print(lines[-1], flush=True)
        assert rel_diff < 1e-3, (
            f"pallas/xla mismatch at {n}x{m}x{p}: rel {rel_diff}"
        )

    # fused generation smoke at the north-star shape
    from abcsmc_tpu.config import parse_config
    from abcsmc_tpu.models.parameters import ParameterSet
    from abcsmc_tpu.models.simulators import make_linear_gaussian_simulator
    from abcsmc_tpu.models.transforms import ParameterTransform
    from abcsmc_tpu.parallel.generation import ShardedGeneration
    from abcsmc_tpu.parallel.mesh import particle_mesh

    npar, nmet, n, keep = 6, 13, 1_000_000, 50_000
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
    gen = ShardedGeneration(
        ParameterSet.from_specs(cfg.parameters),
        ParameterTransform(cfg.parameters),
        make_linear_gaussian_simulator(npar, nmet),
        np.zeros(nmet), mesh=particle_mesh(), dtype=jnp.float32,
    )
    params = jnp.asarray(rng.uniform(0, 1, (n, npar)), jnp.float32)
    # metrics correlated with params (not iid noise): component selection
    # has real structure to find, so ncomp_used > 1 is the expected witness
    mix = rng.normal(size=(npar, nmet)).astype(np.float32)
    mets = jnp.asarray(
        np.asarray(params) @ mix
        + 0.3 * rng.normal(size=(n, nmet)).astype(np.float32)
    )
    state = (
        jnp.asarray(rng.uniform(0.3, 0.7, (keep, npar)), jnp.float32),
        jnp.full((keep,), 1.0 / keep, jnp.float32),
        jnp.full((npar,), 0.02, jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    t = timeit(
        lambda k: gen.step_precomputed(k, params, mets, keep, n, state).weights,
        key,
    )
    res = gen.step_precomputed(key, params, mets, keep, n, state)
    w = np.asarray(res.weights)
    ncomp = int(np.asarray(res.ncomp_used))
    assert np.all(np.isfinite(w)) and w.shape == (keep,)
    # HARD miscompile guard: these metrics are rank-6 structure + noise, so a
    # correct vdv keeps >> 1 component at a 131072-row held-out window. An
    # XLA:TPU fusion bug was observed to corrupt the moment-expansion dot's
    # operands in exactly this fused program (sum-of-squares sections came
    # back negative), collapsing ncomp to 1 with NO other visible symptom -
    # see the MISCOMPILE GUARD barrier in parallel/generation.py. Guard it
    # here, on hardware, where CPU tests cannot.
    assert ncomp > 1, (
        f"fused-vdv selection degenerate on this backend: ncomp_used={ncomp} "
        "(expected >1 on rank-6-structured metrics; the generation.py "
        "moment-expansion miscompile guard may have regressed)"
    )
    lines += [
        "",
        f"Fused generation (1M x 6 x 13, keep 50k, sim excluded, vdv): "
        f"**{t:.4f} s** on {len(jax.devices())} chip(s); weights finite; "
        f"ncomp_used={ncomp}.",
    ]
    print(lines[-1], flush=True)

    # chunked big-N row passes vs the resident path, on hardware at f32
    # (CPU equivalence is pinned by tests; this is the on-chip witness)
    gen_chk = ShardedGeneration(
        ParameterSet.from_specs(cfg.parameters),
        ParameterTransform(cfg.parameters),
        make_linear_gaussian_simulator(npar, nmet),
        np.zeros(nmet), mesh=particle_mesh(), dtype=jnp.float32,
        row_block=1 << 17,
    )
    t_chk = timeit(
        lambda k: gen_chk.step_precomputed(
            k, params, mets, keep, n, state
        ).weights,
        key,
    )
    res_chk = gen_chk.step_precomputed(key, params, mets, keep, n, state)
    ncomp_chk = int(np.asarray(res_chk.ncomp_used))
    si_res = np.asarray(res.survivor_idx)
    si_chk = np.asarray(res_chk.survivor_idx)
    overlap = len(np.intersect1d(si_res, si_chk)) / keep
    same_order = bool(np.array_equal(si_res, si_chk))
    w_diff = (
        float(np.max(np.abs(np.asarray(res_chk.weights) - w)))
        if same_order else float("nan")
    )
    assert ncomp_chk == ncomp, (ncomp_chk, ncomp)
    assert overlap > 0.999, overlap
    lines += [
        "",
        f"Chunked row passes (row_block=131072, 8 blocks at 1M): "
        f"**{t_chk:.4f} s**; ncomp_used={ncomp_chk} (== resident); "
        f"survivor overlap {overlap:.6f}"
        + (f", same order, max |dw| = {w_diff:.3g}" if same_order else
           " (order differs at f32 ties)")
        + ".",
    ]
    print(lines[-1], flush=True)

    header = ""
    if not os.path.exists(LOG):
        header = (
            "# TPU hardware validation log\n\n"
            "Pallas mixture-weight kernel vs the XLA streaming path on the "
            "real chip (tools/tpu_validate.py appends one section per run).\n"
        )
    with open(LOG, "a") as f:
        if header:
            f.write(header)
        f.write("\n".join(lines) + "\n")
    print(f"appended to {LOG}")


if __name__ == "__main__":
    main()
