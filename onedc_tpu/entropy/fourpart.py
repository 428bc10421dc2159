"""Four-part (quadtree) spatial-channel prior: masks + staged coding.

The latent y is coded in 4 interleaved steps; each step covers one
(checkerboard phase x channel quarter) combination so that every step can
condition on everything decoded so far. Semantics match the reference
``CompressionModel.{get_mask_four_parts, forward/compress/decompress_four_
part_prior}`` (compression_model.py:241-407), re-expressed functionally in
NHWC for TPU/XLA.

All mask math is built from broadcasted iota (static shapes) so the whole
four-step training forward jits into one fused program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .bound import ste_round

# step -> channel-quarter -> spatial phase (phase = 2*(h%2) + (w%2))
_PHASE_PERM = (
    (0, 1, 2, 3),
    (3, 2, 1, 0),
    (2, 3, 0, 1),
    (1, 0, 3, 2),
)


def four_part_masks(height: int, width: int, channels: int, dtype=jnp.float32):
    """Return the 4 coding masks, each (1, H, W, C), NHWC."""
    assert channels % 4 == 0
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    phase = (h_ids % 2) * 2 + (w_ids % 2)  # (H, W)
    quarter = jnp.arange(channels) // (channels // 4)  # (C,)
    perm = jnp.asarray(_PHASE_PERM, dtype=jnp.int32)  # (4 steps, 4 quarters)
    # want[s, c] = phase id active at step s for channel c
    want = perm[:, quarter]  # (4, C)
    masks = (phase[None, :, :, None] == want[:, None, None, :]).astype(dtype)
    return tuple(masks[s][None] for s in range(4))


def combine_quarters(x):
    """Sum the 4 channel quarters -> (B, H, W, C/4) (combine_for_writing)."""
    x0, x1, x2, x3 = jnp.split(x, 4, axis=-1)
    return (x0 + x1) + (x2 + x3)


def tile_quarters(x):
    """Inverse layout of combine_quarters: repeat C/4 -> C channels."""
    return jnp.concatenate([x, x, x, x], axis=-1)


def separate_prior(params):
    return jnp.split(params, 2, axis=-1)


class StepResult(NamedTuple):
    y_res: jnp.ndarray
    y_q: jnp.ndarray
    y_hat: jnp.ndarray
    scales_hat: jnp.ndarray


def process_with_mask(y, scales, means, mask, force_zero_thres=None,
                      training=True):
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = ste_round(y_res) if training else jnp.round(y_res)
    if not training and force_zero_thres is not None:
        cond = scales_hat < force_zero_thres
        y_q = jnp.where(cond, 0.0, y_q)
        scales_hat = jnp.where(cond, 0.0, scales_hat)
    y_hat = y_q + means_hat
    return StepResult(y_res, y_q, y_hat, scales_hat)


PriorFn = Callable[[jnp.ndarray], jnp.ndarray]  # params -> (scales|means) 2C


def forward_four_part_prior(
    y: jnp.ndarray,
    common_params: jnp.ndarray,
    prior_steps: Sequence[PriorFn],
    reduction: Optional[PriorFn] = None,
    *,
    training: bool = True,
    force_zero_thres=None,
    write: bool = False,
):
    """Training/compress-side four-step masked coding of y (NHWC).

    ``prior_steps`` are three callables (adaptor_i o spatial_prior); the
    first step uses the hyperprior params directly.
    """
    scales, means = separate_prior(common_params)
    if reduction is not None:
        common_params = reduction(common_params)
    _, h, w, c = y.shape
    masks = four_part_masks(h, w, c, y.dtype)

    results = []
    y_hat_so_far = jnp.zeros_like(y)
    for step in range(4):
        if step > 0:
            params = jnp.concatenate([y_hat_so_far, common_params], axis=-1)
            scales, means = jnp.split(prior_steps[step - 1](params), 2, axis=-1)
        r = process_with_mask(y, scales, means, masks[step],
                              force_zero_thres, training)
        results.append(r)
        y_hat_so_far = y_hat_so_far + r.y_hat

    y_res = sum(r.y_res for r in results)
    y_q = sum(r.y_q for r in results)
    y_hat = y_hat_so_far
    scales_hat = sum(r.scales_hat for r in results)

    if write:
        y_q_w = tuple(combine_quarters(r.y_q) for r in results)
        scales_w = tuple(combine_quarters(r.scales_hat) for r in results)
        return y_q_w, scales_w, y_hat
    return y_res, y_q, y_hat, scales_hat


def forward_four_part_prior_recon_with_z(
    y: jnp.ndarray,
    common_params: jnp.ndarray,
    prior_steps: Sequence[PriorFn],
    reduction: Optional[PriorFn] = None,
):
    """z-only variant: y_hat is the predicted means (no residual coded).

    Mirrors ``forward_four_part_prior_recon_with_z``
    (compression_model.py:421-465).
    """
    scales, means = separate_prior(common_params)
    if reduction is not None:
        common_params = reduction(common_params)
    _, h, w, c = y.shape
    masks = four_part_masks(h, w, c, y.dtype)

    y_hat_so_far = jnp.zeros_like(y)
    for step in range(4):
        if step > 0:
            params = jnp.concatenate([y_hat_so_far, common_params], axis=-1)
            scales, means = jnp.split(prior_steps[step - 1](params), 2, axis=-1)
        y_hat_so_far = y_hat_so_far + means * masks[step]
    return y_hat_so_far


# --------------------------------------------------------------------------
# Decompress-side staged functions.
#
# Decoding needs 4 host<->device round trips (the rANS decode of step i
# feeds the prior net of step i+1). We expose the device work as two
# jittable pieces so the host loop stays thin:
#   decode_step_scales: -> scales_r for the host rANS decode of this step
#   decode_step_update: y_q_r -> updated y_hat accumulation (+ next params)
# --------------------------------------------------------------------------

def decompress_step_scales(scales, mask, force_zero_thres=None):
    scales_r = combine_quarters(scales * mask)
    if force_zero_thres is not None:
        # keep parity with encode-side zeroing for skipped positions
        scales_r = jnp.where(scales_r < force_zero_thres, 0.0, scales_r)
    return scales_r


def decompress_step_update(y_q_r, means, mask, y_hat_so_far):
    y_hat_curr = (tile_quarters(y_q_r) + means) * mask
    return y_hat_so_far + y_hat_curr
