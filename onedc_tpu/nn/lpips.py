"""LPIPS perceptual metric (VGG16 backbone), Flax/NHWC.

Re-implements the LPIPS used by the reference both as a training loss
(piq LPIPS with ``replace_pooling=True`` — avg-pool VGG,
``src/losses/pixel_loss.py:40``) and as an eval metric (lpips alex/vgg,
``src/test_quality.py``).

Pretrained VGG16 + LPIPS linear weights cannot be downloaded here
(zero-egress); ``make_lpips_fn(weights_path)`` loads them from a local
safetensors file with keys:

  features/conv{i}/kernel  (HWIO)   i in 0..12   - VGG16 conv stack
  features/conv{i}/bias
  lin{k}/kernel            (1,1,C,1)  k in 0..4   - LPIPS linear heads

``convert_torch_vgg16`` maps a torchvision VGG16 state dict + LPIPS linear
layers into that layout when torch weights are available on disk.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_ch, pool_before) for the 13 convs
_VGG16_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# feature taps after convs (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_TAPS = (1, 3, 6, 9, 12)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the 5 LPIPS tap activations.

    ``avg_pool=True`` replicates piq's replace_pooling (used in the
    reference training loss); False is the standard max-pool VGG.
    """

    avg_pool: bool = True

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = []
        for i, (ch, pool_before) in enumerate(_VGG16_PLAN):
            if pool_before:
                if self.avg_pool:
                    x = nn.avg_pool(x, (2, 2), (2, 2))
                else:
                    x = nn.max_pool(x, (2, 2), (2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            if i in _TAPS:
                taps.append(x)
        return tuple(taps)


class LPIPS(nn.Module):
    """Full LPIPS head: normalize -> VGG taps -> unit-norm -> linear -> mean."""

    avg_pool: bool = True

    @nn.compact
    def __call__(self, x01, y01):
        """x01, y01: (B,H,W,3) in [0,1]. Returns (B,) distance."""
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)
        xn = (x01 - mean) / std
        yn = (y01 - mean) / std
        vgg = VGG16Features(self.avg_pool, name="features")
        fx = vgg(xn)
        fy = vgg(yn)
        total = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{k}", nn.initializers.ones,
                           (1, 1, d.shape[-1], 1))
            d = jax.lax.conv_general_dilated(
                d, jnp.maximum(w, 0.0), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def make_lpips_fn(weights_path, avg_pool: bool = True) -> Callable:
    """Load weights and return a jitted fn(x01, y01) -> (B,) distances."""
    from ..utils.checkpoint import load_safetensors
    params = {"params": load_safetensors(weights_path)}
    model = LPIPS(avg_pool)
    return jax.jit(lambda x, y: model.apply(params, x, y))


def convert_torch_vgg16(vgg_state: dict, lin_weights: Sequence[np.ndarray]):
    """torchvision VGG16 ``features.*`` state dict + 5 LPIPS lin layers ->
    our safetensors layout. Returns a flat {key: array} dict."""
    # torchvision indices of the 13 convs inside features.*
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, ti in enumerate(conv_idx):
        w = np.asarray(vgg_state[f"features.{ti}.weight"])  # OIHW
        b = np.asarray(vgg_state[f"features.{ti}.bias"])
        out[f"features/conv{i}/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"features/conv{i}/bias"] = b
    for k, lin in enumerate(lin_weights):
        lin = np.asarray(lin)  # (1, C, 1, 1) torch conv weight
        out[f"lin{k}"] = lin.transpose(2, 3, 1, 0)
    return out
