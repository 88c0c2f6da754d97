"""Pallas kernels vs their XLA reference implementations (interpret mode on
the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from abcsmc_tpu.ops.pallas_kernels import mixture_logsumexp
from abcsmc_tpu.ops.weights import _log_kernel_mixture_density_xla, _prep_scaled


@pytest.mark.parametrize("n,m,p", [(100, 70, 3), (600, 1100, 6), (33, 9, 1)])
def test_mixture_logsumexp_matches_xla(n, m, p):
    rng = np.random.default_rng(0)
    params = rng.uniform(0, 1, (n, p))
    prev = rng.uniform(0.2, 0.8, (m, p))
    w = rng.uniform(0.5, 1.5, m)
    w /= w.sum()
    dv = rng.uniform(0.01, 0.1, p)

    expect = np.asarray(_log_kernel_mixture_density_xla(
        jnp.asarray(params), jnp.asarray(prev), jnp.log(jnp.asarray(w)),
        jnp.asarray(dv), block=256,
    ))

    a, b, log_norm = _prep_scaled(
        jnp.asarray(params, jnp.float32), jnp.asarray(prev, jnp.float32),
        jnp.asarray(dv, jnp.float32),
    )
    got = np.asarray(mixture_logsumexp(
        a, b, jnp.log(jnp.asarray(w, jnp.float32)),
        block_i=128, block_j=256, interpret=True,
    )) + float(log_norm)

    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_mixture_logsumexp_extreme_weights():
    """-inf log-weights (padded/zero-weight centers) must drop out cleanly."""
    rng = np.random.default_rng(1)
    n, m, p = 64, 40, 2
    a = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(m, p)), jnp.float32)
    lw = np.full(m, np.log(1.0 / 20), np.float32)
    lw[20:] = -1e30  # effectively zero weight
    got = np.asarray(mixture_logsumexp(
        a, b, jnp.asarray(lw), block_i=128, block_j=128, interpret=True
    ))
    # equal to using only the first 20 centers
    expect = np.asarray(mixture_logsumexp(
        a, b[:20], jnp.asarray(lw[:20]), block_i=128, block_j=128,
        interpret=True,
    ))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
