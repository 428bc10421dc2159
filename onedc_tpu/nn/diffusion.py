"""Diffusion schedule utilities for the one-step generator.

The reference only uses the DDIM scheduler for its alphas_cumprod table
(``model_sd15_with_codec_stage1.py:103-106``) and recovers x0 with
``get_x0_from_noise`` (``src/modules/dmd/utils.py:279-284``). SD1.5 uses the
"scaled_linear" beta schedule: beta in [0.00085, 0.012] over 1000 steps,
linear in sqrt(beta).

The reference computes x0 in float64 because alpha_bar(999) ~ 4.7e-3 is
tiny; the division only rescales, so float32 keeps full *relative*
precision. We pin the computation to float32 (upcasting from bf16) — on TPU
f64 is emulated and slow, and f32 here is numerically equivalent to the
reference's f64 to within output tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_alphas_cumprod(num_train_timesteps: int = 1000,
                        beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> np.ndarray:
    """SD1.5 scaled_linear schedule, computed in float64 on the host."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def get_x0_from_noise(sample, eps, alphas_cumprod, timestep):
    """x0 = (sample - sqrt(1-abar)*eps) / sqrt(abar), in float32.

    ``sample`` is the UNet's vae_reduction output (the pseudo "noisy
    latent"); ``eps`` its epsilon prediction; timestep (B,) int.
    """
    abar = jnp.asarray(alphas_cumprod, jnp.float32)[timestep]
    abar = abar.reshape(-1, 1, 1, 1)
    sample32 = sample.astype(jnp.float32)
    eps32 = eps.astype(jnp.float32)
    return (sample32 - jnp.sqrt(1.0 - abar) * eps32) / jnp.sqrt(abar)
