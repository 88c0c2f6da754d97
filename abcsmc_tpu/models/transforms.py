"""Fitting-space -> model-space parameter transforms, vectorized.

The reference applies, per transformed parameter j (include/AbcSmc/ParXform.h:11-68,
assembled at src/AbcSmc.cpp:432-447):

    x'_j = rescale_j( u_j((x_j + a_j) * b_j) + c_j) * d_j )   -- NB see below
         where  a_j = sum  of fitting-space values at `transformed_addend` indices
                b_j = prod of fitting-space values at `transformed_factor` indices
                c_j = sum  of fitting-space values at `untransformed_addend` indices
                d_j = prod of fitting-space values at `untransformed_factor` indices
                u_j in {identity, 10**x, logistic}
                rescale_j(v) = (max_j - min_j) * v + min_j

(Exactly: transform returns (u((x+a)*b)+c)*d, then rescale((...)) is applied —
ParXform.h:47-53 then AbcSmc.cpp:441-443.)

Untransformed parameters pass through unchanged. All addend/factor indices refer to
*fitting-space* values of the full parameter row, so the whole mapping is a cheap
vectorized gather + elementwise op over the population.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from abcsmc_tpu.config import ParameterSpec, TransformFunc


def _apply_func(func: TransformFunc, x):
    if func == TransformFunc.NONE:
        return x
    if func == TransformFunc.POW_10:
        return jnp.power(10.0, x)
    if func == TransformFunc.LOGISTIC:
        return 1.0 / (1.0 + jnp.exp(-x))
    raise ValueError(f"unknown transform func {func}")


class ParameterTransform:
    """Vectorized model-space mapping for a full parameter set.

    ``to_model_space(theta[N, P]) -> upars[N, P]`` mirrors
    AbcSmc::_to_model_space (src/AbcSmc.cpp:432-447).
    """

    def __init__(self, specs: Sequence[ParameterSpec]):
        self.specs = list(specs)
        self.has_any = any(s.untransform is not None for s in self.specs)

    def to_model_space(self, theta):
        if not self.has_any:
            return theta
        theta = jnp.asarray(theta)
        cols = []
        for j, spec in enumerate(self.specs):
            u = spec.untransform
            x = theta[:, j]
            if u is None:
                cols.append(x)
                continue
            a = sum((theta[:, i] for i in u.transformed_addend_idx), start=jnp.zeros_like(x))
            b = jnp.ones_like(x)
            for i in u.transformed_factor_idx:
                b = b * theta[:, i]
            c = sum((theta[:, i] for i in u.untransformed_addend_idx), start=jnp.zeros_like(x))
            d = jnp.ones_like(x)
            for i in u.untransformed_factor_idx:
                d = d * theta[:, i]
            val = (_apply_func(u.func, (x + a) * b) + c) * d
            val = (u.rescale_max - u.rescale_min) * val + u.rescale_min
            cols.append(val)
        return jnp.stack(cols, axis=1)
