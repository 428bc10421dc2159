"""InceptionV3 feature extractor (FID variant), Flax/NHWC.

TPU-native counterpart of the feature network behind the reference's
FID/KID/IS metrics (``src/test_quality.py:12-14`` uses torchmetrics'
FrechetInceptionDistance / KernelInceptionDistance / InceptionScore, all
of which wrap the torch-fidelity "FID Inception" — torchvision
InceptionV3 with the pytorch-fid quirks: exclude-padding average pools
and a max-pool branch in the last mixed block).

Design notes:
- BatchNorm is folded into the conv weights at conversion time
  (inference-only network -> fewer ops, better XLA fusion).
- Input is uint8-range RGB (B,H,W,3); the module resizes to 299x299
  bilinear (align_corners=False semantics) and scales to [-1,1], matching
  torch-fidelity's input pipeline.
- ``pool3`` (2048-d global-avg features) feeds FID/KID; ``logits``
  (1008-way, the original TF class layout) feeds the Inception Score.

Weights must be provided on disk (zero-egress environment):
``convert_torch_inception`` maps a pytorch-fid / torch-fidelity
``pt_inception-2015-12-05`` state dict into our safetensors layout.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def avg_pool_exclude_pad(x, window: int = 3, stride: int = 1,
                         pad: int = 1):
    """Average pool whose divisor counts only in-bounds elements
    (torch ``avg_pool2d(count_include_pad=False)``, the pytorch-fid
    InceptionA/C/E quirk)."""
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides,
                                   padding)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides,
                                  padding)
    return summed / count


def max_pool(x, window: int = 3, stride: int = 2, pad: int = 0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class BasicConv(nn.Module):
    """Conv + bias (BN pre-folded) + ReLU."""

    out_ch: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, (self.stride, self.stride),
                    padding=(self.padding, self.padding)
                    if isinstance(self.padding, int) else
                    tuple((p, p) for p in self.padding),
                    name="conv")(x)
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_exclude_pad(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    ch7: int

    @nn.compact
    def __call__(self, x):
        c = self.ch7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_exclude_pad(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # 'avg' for Mixed_7b (FIDInceptionE_1), 'max' for Mixed_7c
    # (FIDInceptionE_2 replaces the average pool with max)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1),
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0),
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = avg_pool_exclude_pad(x)
        else:
            bp = max_pool(x, 3, 1, 1)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID-variant InceptionV3. Input: (B,H,W,3) float in [0,255]."""

    num_classes: int = 1008  # the TF-Slim FID checkpoint layout

    @nn.compact
    def __call__(self, x255):
        x = x255.astype(jnp.float32) / 255.0
        # bilinear resize to 299 with antialias OFF, matching torch
        # F.interpolate(align_corners=False) for both up- AND downscale
        # (patch sizes above 299 would otherwise silently antialias and
        # diverge from the torchmetrics protocol)
        if x.shape[1] != 299 or x.shape[2] != 299:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear",
                antialias=False)
        x = (x - 0.5) * 2.0

        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # (B, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        return pool3, logits


def make_inception_fn(weights_path: str,
                      batch: int = 32) -> Callable[[np.ndarray], dict]:
    """Load converted weights; return fn(uint8 patches NHWC) ->
    {'features': (N,2048), 'logits': (N,num_classes)} numpy.

    Batches internally with a fixed compiled batch size (pad + mask) so
    arbitrary patch counts reuse one XLA program.
    """
    from ..utils.checkpoint import load_safetensors
    tree = load_safetensors(weights_path)  # nested {module: {...}}
    num_classes = tree["fc"]["kernel"].shape[-1]
    params = {"params": jax.tree_util.tree_map(jnp.asarray, tree)}
    model = InceptionV3(num_classes=num_classes)
    apply_j = jax.jit(lambda p, x: model.apply(p, x))

    def fn(patches: np.ndarray) -> dict:
        patches = np.asarray(patches, np.float32)  # uint8-range 0..255
        feats, logits = [], []
        for i in range(0, len(patches), batch):
            chunk = patches[i:i + batch]
            n = len(chunk)
            if n < batch:  # pad to the compiled batch
                chunk = np.concatenate(
                    [chunk, np.zeros((batch - n,) + chunk.shape[1:],
                                     np.float32)])
            f, l = apply_j(params, jnp.asarray(chunk))
            feats.append(np.asarray(f[:n]))
            logits.append(np.asarray(l[:n]))
        return {"features": np.concatenate(feats),
                "logits": np.concatenate(logits)}

    return fn


def convert_torch_inception(state: dict, bn_eps: float = 1e-3) -> dict:
    """pytorch-fid ``pt_inception-2015-12-05`` (or torchvision
    inception_v3) state dict -> flat {key: np.ndarray} in our layout,
    with BatchNorm folded into each conv.

    torch keys: ``<block>.conv.weight`` (OIHW, no bias) +
    ``<block>.bn.{weight,bias,running_mean,running_var}``; ``fc.weight``
    (out,in) + ``fc.bias``.
    """
    out = {}
    convs = sorted({k[:-len(".conv.weight")] for k in state
                    if k.endswith(".conv.weight")})
    for name in convs:
        w = np.asarray(state[f"{name}.conv.weight"], np.float64)  # OIHW
        gamma = np.asarray(state[f"{name}.bn.weight"], np.float64)
        beta = np.asarray(state[f"{name}.bn.bias"], np.float64)
        mean = np.asarray(state[f"{name}.bn.running_mean"], np.float64)
        var = np.asarray(state[f"{name}.bn.running_var"], np.float64)
        scale = gamma / np.sqrt(var + bn_eps)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
        key = name.replace(".", "/")
        out[f"{key}/conv/kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"{key}/conv/bias"] = b.astype(np.float32)
    out["fc/kernel"] = np.asarray(state["fc.weight"]).T.astype(np.float32)
    out["fc/bias"] = np.asarray(state["fc.bias"]).astype(np.float32)
    return out


def random_inception_weights(seed: int = 0, num_classes: int = 8) -> dict:
    """Random-init weights in the converted layout (for tests/fixtures
    where pretrained weights are unavailable)."""
    from ..utils.checkpoint import flatten_params
    model = InceptionV3(num_classes=num_classes)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(seed)},
        jnp.zeros((1, 299, 299, 3))))()
    return flatten_params(params["params"])
