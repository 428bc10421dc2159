"""Exponential moving average of parameters.

The reference ships an EMA helper in ``src/modules/dmd/utils.py`` (unused
by the shipped trainers); provided here as a first-class training option.
Functional: state is a params-shaped pytree updated inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree_util.tree_map(jnp.asarray, params)


def ema_update(ema_params, new_params, decay: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, new_params)
