"""SD-class KL autoencoder (Flax/NHWC) with windowed mid-block attention.

Re-implementation of the public AutoencoderKL architecture (SD 2.1 VAE:
block channels (128, 256, 512, 512), 2 layers/block, 4-ch latent, mid-block
attention) with the OneDC modification: encoder/decoder mid-block attention
runs on non-overlapping windows of ``attn_patch`` latent pixels
(ref ``src/modules/vae/autoencoders_patch_attn.py:9-29``).

TPU-native difference from the reference: the eval-time Python loop over
windows is replaced by a batched window reshape (einops-free), identical
math for both train and eval, fully jittable at any x64-padded size.

Also provides ``TinyVAE`` mirroring the public taesd architecture (the
reference's small-VAE option, ``model_sd15_with_codec_stage1.py:39-41``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas_conv import affine_silu_conv3x3
from .attention import multi_head_attention
from .blocks import GroupNorm, UpsampleConv2x


class Conv2dParams(nn.Module):
    """Parameter container with nn.Conv's names/init, for ops that
    consume raw (kernel, bias) — e.g. the fused GN+SiLU+conv kernel."""

    in_ch: int
    out_ch: int
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel, self.in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return k, b


class VaeResnetBlock(nn.Module):
    """diffusers vae ResnetBlock2D (no time embedding).

    The norm -> silu -> conv pairs run through the fused
    ``affine_silu_conv3x3`` (Pallas input-staging fusion on TPU at
    supported shapes, identical XLA composition elsewhere). Param tree is
    unchanged: norm1/norm2 GroupNorm + conv1/conv2 kernel/bias.
    """

    out_ch: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        m1, a1 = GroupNorm(32, self.eps, name="norm1")(
            x, return_affine=True)
        k1, b1 = Conv2dParams(in_ch, self.out_ch, name="conv1")()
        h = affine_silu_conv3x3(x, m1, a1, k1, b1)
        m2, a2 = GroupNorm(32, self.eps, name="norm2")(
            h, return_affine=True)
        k2, b2 = Conv2dParams(self.out_ch, self.out_ch, name="conv2")()
        h = affine_silu_conv3x3(h, m2, a2, k2, b2)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


def window_partition(x, p: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // p) * (w // p), p, p, c), (b, h // p, w // p)


def window_merge(x, meta, p: int):
    b, nh, nw = meta
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, nh * p, nw * p, c)


class VaeAttention(nn.Module):
    """Single-head mid-block attention, optionally windowed.

    ``attn_patch`` <= 0 or window >= spatial size -> global attention.
    """

    channels: int
    attn_patch: int = 16
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        xn = GroupNorm(32, self.eps, name="group_norm")(x)

        p = self.attn_patch
        windowed = p > 0 and (h > p or w > p) and h % p == 0 and w % p == 0
        if windowed:
            xw, meta = window_partition(xn, p)
        else:
            xw = xn
        bb, hh, ww, _ = xw.shape
        flat = xw.reshape(bb, hh * ww, c)
        q = nn.Dense(c, name="to_q")(flat)
        k = nn.Dense(c, name="to_k")(flat)
        v = nn.Dense(c, name="to_v")(flat)
        out = multi_head_attention(q[:, None], k[:, None], v[:, None],
                                   c ** -0.5)[:, 0]
        out = nn.Dense(c, name="to_out")(out).reshape(bb, hh, ww, c)
        if windowed:
            out = window_merge(out, meta, p)
        return out + res


class VaeDownBlock(nn.Module):
    out_ch: int
    num_layers: int = 2
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = VaeResnetBlock(self.out_ch, name=f"resnets_{i}")(x)
        if self.add_downsample:
            # diffusers uses asymmetric padding (0,1,0,1) for vae downsample
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding="VALID",
                        name="downsamplers_0")(x)
        return x


class VaeUpBlock(nn.Module):
    out_ch: int
    num_layers: int = 3
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = VaeResnetBlock(self.out_ch, name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = UpsampleConv2x(self.out_ch, name="upsamplers_0")(x)
        return x


class VaeMidBlock(nn.Module):
    channels: int
    attn_patch: int = 16

    @nn.compact
    def __call__(self, x):
        x = VaeResnetBlock(self.channels, name="resnets_0")(x)
        x = VaeAttention(self.channels, self.attn_patch, name="attentions_0")(x)
        x = VaeResnetBlock(self.channels, name="resnets_1")(x)
        return x


class VaeEncoder(nn.Module):
    block_channels: Sequence[int] = (128, 256, 512, 512)
    latent_ch: int = 4
    layers_per_block: int = 2
    attn_patch: int = 16
    double_z: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_channels[0], (3, 3), padding=1, name="conv_in")(x)
        n = len(self.block_channels)
        for i, c in enumerate(self.block_channels):
            x = VaeDownBlock(c, self.layers_per_block,
                             add_downsample=i < n - 1,
                             name=f"down_blocks_{i}")(x)
        x = VaeMidBlock(self.block_channels[-1], self.attn_patch,
                        name="mid_block")(x)
        x = GroupNorm(32, 1e-6, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        out_ch = self.latent_ch * 2 if self.double_z else self.latent_ch
        x = nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(x)
        # diffusers quant_conv (1x1 on moments)
        return nn.Conv(out_ch, (1, 1), name="quant_conv")(x)


class VaeDecoder(nn.Module):
    block_channels: Sequence[int] = (128, 256, 512, 512)
    out_ch: int = 3
    layers_per_block: int = 3
    attn_patch: int = 16

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(z.shape[-1], (1, 1), name="post_quant_conv")(z)
        rev = list(reversed(self.block_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in")(z)
        x = VaeMidBlock(rev[0], self.attn_patch, name="mid_block")(x)
        n = len(rev)
        for i, c in enumerate(rev):
            x = VaeUpBlock(c, self.layers_per_block,
                           add_upsample=i < n - 1,
                           name=f"up_blocks_{i}")(x)
        x = GroupNorm(32, 1e-6, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Full KL VAE; `encode` returns (mean, logvar) moments."""

    block_channels: Sequence[int] = (128, 256, 512, 512)
    latent_ch: int = 4
    attn_patch: int = 16
    scaling_factor: float = 0.18215

    def setup(self):
        self.encoder = VaeEncoder(self.block_channels, self.latent_ch,
                                  attn_patch=self.attn_patch)
        self.decoder = VaeDecoder(self.block_channels,
                                  attn_patch=self.attn_patch)

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar


# ---------------------------------------------------------------------------
# Tiny VAE (taesd architecture)
# ---------------------------------------------------------------------------

class TaesdBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_0")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_4")(h)
        skip = x if x.shape[-1] == self.ch else nn.Conv(
            self.ch, (1, 1), use_bias=False, name="skip")(x)
        return jax.nn.relu(h + skip)


class TinyVaeDecoder(nn.Module):
    """taesd decoder: latent 4 -> image 3, x8 upsampling."""

    ch: int = 64
    out_ch: int = 3

    @nn.compact
    def __call__(self, z):
        x = jnp.tanh(z / 3.0) * 3.0  # taesd input clamp
        x = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)
        x = jax.nn.relu(x)
        for stage in range(3):
            for b in range(3):
                x = TaesdBlock(self.ch, name=f"stage{stage}_block{b}")(x)
            x = UpsampleConv2x(self.ch, use_bias=False,
                               name=f"stage{stage}_conv")(x)
        x = TaesdBlock(self.ch, name="final_block")(x)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(x)


class TinyVaeEncoder(nn.Module):
    ch: int = 64
    latent_ch: int = 4

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)
        for stage in range(3):
            x = nn.Conv(self.ch, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, name=f"stage{stage}_down")(x)
            for b in range(3):
                x = TaesdBlock(self.ch, name=f"stage{stage}_block{b}")(x)
        return nn.Conv(self.latent_ch, (3, 3), padding=1, name="conv_out")(x)
