"""Pallas TPU kernels for the hot SMC ops.

``mixture_logsumexp``: the kernel-mixture weight denominator
(src/AbcUtil.cpp:563-578 - the O(N*M*P) loop) as a flash-attention-style
streaming kernel: for each block of query particles, stream blocks of the
previous generation's survivors through VMEM, compute the scaled-distance
logits as one MXU matmul, and maintain an online (max, sum) logsumexp in
scratch - the N x M logit matrix never exists in HBM.

Inputs are pre-scaled (columns divided by sqrt(doubled variance), converged
columns dropped) by the caller (abcsmc_tpu.ops.weights._prep_scaled); this
kernel computes

    out[i] = logsumexp_j ( a_i . b_j - ||a_i||^2/2 - ||b_j||^2/2 + log_w[j] )
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mixture_kernel(a_ref, b_ref, lw_ref, out_ref, m_scr, s_scr, *, precision):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        s_scr[:] = jnp.zeros_like(s_scr)

    a = a_ref[:]                      # [BI, P]
    b = b_ref[:]                      # [BJ, P]
    lw = lw_ref[:]                    # [1, BJ]

    asq = jnp.sum(a * a, axis=1, keepdims=True)        # [BI, 1]
    bsq = jnp.sum(b * b, axis=1, keepdims=True).T      # [1, BJ]
    # NB: a hand-rolled 3-pass split-bf16 product (bit-masked hi/lo split,
    # a_hi.b_hi + a_hi.b_lo + a_lo.b_hi at DEFAULT precision) was tried here
    # and measured SLOWER than precision="highest" on v5e (98 vs 52 ms at
    # 50k^2): Mosaic fuses the HIGHEST passes into one MXU pipeline, while
    # three separate dots pay three VMEM traversals plus the VPU split work.
    # (An astype-based split doesn't work at all - the f32->bf16->f32 chain
    # is folded away inside pallas.)
    logits = (
        jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                precision=precision)
        - 0.5 * asq
        - 0.5 * bsq
        + lw
    )                                                   # [BI, BJ]

    run_max = m_scr[:]                                  # [BI, 1]
    blk_max = jnp.max(logits, axis=1, keepdims=True)
    new_max = jnp.maximum(run_max, blk_max)
    s_scr[:] = s_scr[:] * jnp.exp(run_max - new_max) + jnp.sum(
        jnp.exp(logits - new_max), axis=1, keepdims=True
    )
    m_scr[:] = new_max

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = m_scr[:] + jnp.log(s_scr[:])


@functools.partial(
    jax.jit,
    static_argnames=("block_i", "block_j", "interpret", "precision"),
)
def mixture_logsumexp(
    a, b, log_w, block_i: int = 512, block_j: int = 2048,
    interpret: bool = False, precision: str = "highest",
):
    """out[i] = logsumexp_j(a_i.b_j - |a_i|^2/2 - |b_j|^2/2 + log_w[j]).

    a: [n, p] scaled query particles; b: [m, p] scaled mixture centers;
    log_w: [m] log mixture weights. Returns [n] float32.

    ``precision`` sets the MXU dot precision. The kernel is VPU-bound (the
    streaming exp/max dominates; the matmul's K dim is at most 128), so the
    default "highest" (full f32) costs only a few percent over bf16 passes
    while cutting the log-density error ~400x (bf16 input rounding is the
    dominant error term at this scale - measured on v5e, see
    docs/TPU_VALIDATION.md).
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    log_w = jnp.asarray(log_w, jnp.float32)
    n, p = a.shape
    m = b.shape[0]

    # pad the feature axis to the 128-lane boundary (zeros are harmless:
    # they contribute nothing to dots or squared norms)
    p_pad = max(128, -(-p // 128) * 128)
    a = jnp.pad(a, ((0, 0), (0, p_pad - p)))
    b = jnp.pad(b, ((0, 0), (0, p_pad - p)))

    ni = -(-n // block_i)
    nj = -(-m // block_j)
    n_pad = ni * block_i - n
    m_pad = nj * block_j - m
    a = jnp.pad(a, ((0, n_pad), (0, 0)))
    b = jnp.pad(b, ((0, m_pad), (0, 0)))
    # padded centers get weight exp(NEG_INF) = 0
    lw = jnp.pad(log_w, (0, m_pad), constant_values=NEG_INF).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(_mixture_kernel, precision=precision),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((block_i, p_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, p_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni * block_i, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_i, 1), jnp.float32),
            pltpu.VMEM((block_i, 1), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, lw)
    return out[:n, 0]
