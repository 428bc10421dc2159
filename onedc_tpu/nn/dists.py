"""DISTS (Deep Image Structure and Texture Similarity), Flax/NHWC.

TPU-native counterpart of the reference's eval-side DISTS metric
(``src/test_quality.py:10,238`` uses the DISTS_pytorch package): a VGG16
trunk whose max-pools are replaced by L2-pooling (hanning-windowed RMS
downsampling), with learned per-channel texture (alpha) and structure
(beta) weights over six feature stages (the raw image + relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3).

Weights come from disk (zero-egress): ``convert_torch_dists`` maps the
package's torchvision-VGG16 trunk + alpha/beta buffers into our
safetensors layout (keys ``features/conv{i}/{kernel,bias}``, ``alpha``,
``beta``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .lpips import _IMAGENET_MEAN, _IMAGENET_STD, _VGG16_PLAN

# channels of the six DISTS stages (input image + 5 VGG taps)
DISTS_CHNS = (3, 64, 128, 256, 512, 512)
# conv index right before each stage tap (relu1_2 .. relu5_3)
_STAGE_END = (1, 3, 6, 9, 12)


def l2_pool(x, window: int = 3, stride: int = 2):
    """Hanning-windowed RMS downsample (DISTS L2pooling: hanning(5)[1:-1]
    outer product, normalized; conv stride 2 pad 1 per channel;
    sqrt(out + 1e-12))."""
    a = np.hanning(window + 2)[1:-1]
    g = np.outer(a, a)
    g = (g / g.sum()).astype(np.float32)
    c = x.shape[-1]
    k = jnp.asarray(g).reshape(window, window, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x * x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jnp.sqrt(out + 1e-12)


class _DISTSTrunk(nn.Module):
    """Raw image + 5 VGG taps with L2 pooling between stages."""

    @nn.compact
    def __call__(self, img01):
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)
        feats = [img01]
        h = (img01 - mean) / std
        for i, (ch, pool_before) in enumerate(_VGG16_PLAN):
            if pool_before:
                h = l2_pool(h)
            h = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(h)
            h = jax.nn.relu(h)
            if i in _STAGE_END:
                feats.append(h)
        return feats


class DISTS(nn.Module):
    """fn(x01, y01) -> (B,) DISTS distance, inputs (B,H,W,3) in [0,1]."""

    c1: float = 1e-6
    c2: float = 1e-6

    @nn.compact
    def __call__(self, x01, y01):
        # one trunk instance called twice -> shared VGG params
        trunk = _DISTSTrunk(name="features")
        fx = trunk(x01)
        fy = trunk(y01)

        total_c = sum(DISTS_CHNS)
        alpha = self.param("alpha", nn.initializers.normal(0.01),
                           (1, total_c))
        beta = self.param("beta", nn.initializers.normal(0.01),
                          (1, total_c))
        w_sum = jnp.sum(alpha) + jnp.sum(beta)
        a_split = _split(alpha, DISTS_CHNS)
        b_split = _split(beta, DISTS_CHNS)

        dist1 = 0.0
        dist2 = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            x_mean = jnp.mean(a, axis=(1, 2), keepdims=True)
            y_mean = jnp.mean(b, axis=(1, 2), keepdims=True)
            s1 = ((2 * x_mean * y_mean + self.c1)
                  / (x_mean ** 2 + y_mean ** 2 + self.c1))
            x_var = jnp.mean((a - x_mean) ** 2, axis=(1, 2), keepdims=True)
            y_var = jnp.mean((b - y_mean) ** 2, axis=(1, 2), keepdims=True)
            xy_cov = (jnp.mean(a * b, axis=(1, 2), keepdims=True)
                      - x_mean * y_mean)
            s2 = (2 * xy_cov + self.c2) / (x_var + y_var + self.c2)
            dist1 = dist1 + jnp.sum(
                a_split[k][None] * s1[:, 0, 0, :], axis=-1)
            dist2 = dist2 + jnp.sum(
                b_split[k][None] * s2[:, 0, 0, :], axis=-1)
        return 1.0 - (dist1 + dist2) / w_sum


def _split(w, chns: Sequence[int]):
    out = []
    i = 0
    for c in chns:
        out.append(w[0, i:i + c])
        i += c
    return out


def make_dists_fn(weights_path: str) -> Callable:
    """Load converted weights; return jitted fn(x01, y01) -> (B,)."""
    from ..utils.checkpoint import load_safetensors
    params = jax.tree_util.tree_map(jnp.asarray,
                                    load_safetensors(weights_path))
    model = DISTS()
    return jax.jit(lambda x, y: model.apply({"params": params}, x, y))


def convert_torch_dists(vgg_state: dict, alpha: np.ndarray,
                        beta: np.ndarray) -> dict:
    """torchvision VGG16 ``features.*`` state dict + the DISTS package's
    alpha/beta buffers (each (1, 1472, 1, 1) excluding the image stage, or
    (1, 1475, 1, 1) including it) -> our flat layout."""
    from .lpips import convert_torch_vgg16
    out = {k: v for k, v in convert_torch_vgg16(vgg_state, []).items()}
    alpha = np.asarray(alpha, np.float32).reshape(1, -1)
    beta = np.asarray(beta, np.float32).reshape(1, -1)
    total = sum(DISTS_CHNS)
    if alpha.shape[1] == total - 3:  # package stores stages 1..5 only
        pad = np.zeros((1, 3), np.float32)
        alpha = np.concatenate([pad, alpha], axis=1)
        beta = np.concatenate([pad, beta], axis=1)
    assert alpha.shape[1] == total, alpha.shape
    out["alpha"] = alpha
    out["beta"] = beta
    return out


def random_dists_weights(seed: int = 0) -> dict:
    """Random-init weights in the converted layout (test fixtures)."""
    model = DISTS()
    x = jnp.zeros((1, 64, 64, 3))
    from ..utils.checkpoint import flatten_params
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(seed)}, x, x))()["params"]
    return flatten_params(params)
