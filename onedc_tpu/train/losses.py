"""Rate-distortion training losses.

JAX re-implementation of the reference ``SQ_Perceptual_loss`` and
``Linear_lmbda_scheduler`` (``src/losses/pixel_loss.py``): pixel L1/MSE +
LPIPS + lambda * bpp with a quadratic-ramp lambda schedule.

The LPIPS term is pluggable: pass any ``fn(x01, y01) -> scalar`` (see
``onedc_tpu/nn/lpips.py``); with ``lpips_fn=None`` the term is 0 — used by
unit tests and by training runs before perceptual weights are loaded.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp


def lambda_schedule(step, start_step: float, end_step: float,
                    start_value: float, end_value: float):
    """Quadratic ramp: factor = clip((t-t0)/(t1-t0), 0, 1) ** 2
    (ref pixel_loss.py:6-25)."""
    factor = jnp.clip((step - start_step) / (end_step - start_step), 0.0, 1.0)
    return start_value + factor ** 2 * (end_value - start_value)


class RDLoss:
    """pix + LPIPS + lambda*bpp (ref pixel_loss.py:28-89)."""

    def __init__(self, pix_weight: float = 1.0, lpips_weight: float = 1.0,
                 lmbda: float = 1.8, lmbda_schedule: Optional[dict] = None,
                 pix_loss_type: str = "l1",
                 lpips_fn: Optional[Callable] = None):
        assert pix_loss_type in ("l1", "mse")
        self.pix_weight = pix_weight
        self.lpips_weight = lpips_weight
        self.lmbda = lmbda
        self.lmbda_schedule = lmbda_schedule
        self.pix_loss_type = pix_loss_type
        self.lpips_fn = lpips_fn

    def __call__(self, x, x_hat, bpp, step=None, norm01: bool = True,
                 training: bool = True) -> Tuple[jnp.ndarray, Dict]:
        if norm01:  # [-1,1] -> [0,1]
            x = x * 0.5 + 0.5
            x_hat = x_hat * 0.5 + 0.5

        if self.pix_loss_type == "l1":
            l_pix = jnp.mean(jnp.abs(x - x_hat))
        else:
            l_pix = jnp.mean((x - x_hat) ** 2)
        l_weighted_pix = l_pix * self.pix_weight

        if self.lpips_fn is not None:
            l_lpips = jnp.mean(self.lpips_fn(x, x_hat))
        else:
            l_lpips = jnp.zeros(())
        l_weighted_lpips = l_lpips * self.lpips_weight

        if step is not None and self.lmbda_schedule and training:
            lmbda = lambda_schedule(step, **self.lmbda_schedule)
        else:
            lmbda = jnp.asarray(self.lmbda)
        l_weighted_bpp = bpp * lmbda

        distortion = l_weighted_pix + l_weighted_lpips
        loss = distortion + l_weighted_bpp
        return loss, {
            "pix": l_pix,
            "lpips": l_lpips,
            "bpp": bpp,
            "weighted_pix": l_weighted_pix,
            "weighted_lpips": l_weighted_lpips,
            "distortion": distortion,
            "weighted_bpp": l_weighted_bpp,
            "lmbda": lmbda,
            "total_loss": loss,
        }
