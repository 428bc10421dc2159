"""Differentiable bounds and quantization primitives (JAX).

TPU-native equivalents of the reference's autograd helpers:
- ``lower_bound``: max(x, bound) with pass-through gradients
  (ref ``entropy_models.py:14-29``)
- ``ste_round``: straight-through rounding (ref ``compression_model.py:87-93``)
- ``add_uniform_noise``: training-time quantization proxy
  (ref ``compression_model.py:125-134``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound,)


def _lower_bound_bwd(res, g):
    (pass_through_1,) = res
    pass_through = pass_through_1 | (g < 0)
    return (pass_through.astype(g.dtype) * g, None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def ste_round(x):
    """Round with straight-through gradient (identity backward)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def add_uniform_noise(key, x, noise_level: float = 0.5):
    noise = jax.random.uniform(
        key, x.shape, dtype=x.dtype, minval=-noise_level, maxval=noise_level)
    return x + jax.lax.stop_gradient(noise)
