"""Encoder UNet: the analysis-transform backbone of the latent codec.

A Flax/NHWC re-implementation of the reference's modified ``UNet2DModel``
(``encoder_unet.py:137-161``): down path AttnDown/AttnDown/Down with
channels (512, 768, 768) and 2 layers per block, mid block with attention,
up path AttnUp/AttnUp/Up applied deepest-first (attention at /64 and /32 —
not a mirror of the down path), fixed t=999 time conditioning, and a
replaced ``conv_in``
(3 VQGAN-style resnet blocks + stride-2 conv, so the UNet runs at /16 with
a /64 mid). Forward returns ``(y /16, sem /64)`` where sem is the mid-block
feature used as the semantic hyperprior input.

Architecture follows the public diffusers UNet2DModel layout so torch
checkpoints map 1:1; attention uses head_dim=8 (`attention_head_dim`
default), i.e. channels/8 heads.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import multi_head_attention_bnhd
from .blocks import GroupNorm, ResnetBlockVQ, UpsampleConv2x


def sinusoidal_time_embedding(timesteps, dim: int, *, flip_sin_to_cos: bool,
                              downscale_freq_shift: float,
                              max_period: int = 10000):
    """diffusers Timesteps embedding (get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim, name="linear_1")(t_emb)
        x = jax.nn.silu(x)
        return nn.Dense(self.dim, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D ('default' time-scale-shift), NHWC."""

    out_ch: int
    eps: float = 1e-5
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        t = nn.Dense(self.out_ch, name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.eps, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class SelfAttention2D(nn.Module):
    """diffusers Attention block used by UNet2DModel (deprecated AttnBlock
    style): GroupNorm -> per-pixel qkv linear, multi-head, residual."""

    channels: int
    head_dim: int = 8
    eps: float = 1e-5
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = c // self.head_dim
        res = x
        xn = GroupNorm(self.groups, self.eps, name="group_norm")(x)
        flat = xn.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(flat)
        k = nn.Dense(c, name="to_k")(flat)
        v = nn.Dense(c, name="to_v")(flat)

        def split(t):
            return t.reshape(b, h * w, heads, self.head_dim)

        q, k, v = split(q), split(k), split(v)
        out = multi_head_attention_bnhd(q, k, v, self.head_dim ** -0.5)
        out = out.reshape(b, h * w, c)
        out = nn.Dense(c, name="to_out")(out)
        return out.reshape(b, h, w, c) + res


class Downsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return UpsampleConv2x(self.channels, name="conv")(x)


class DownBlock2D(nn.Module):
    out_ch: int
    num_layers: int = 2
    add_attention: bool = False
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x, temb):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_ch, name=f"resnets_{i}")(x, temb)
            if self.add_attention:
                x = SelfAttention2D(self.out_ch, name=f"attentions_{i}")(x)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_ch, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UpBlock2D(nn.Module):
    out_ch: int
    num_layers: int = 3
    add_attention: bool = False
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.num_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_ch, name=f"resnets_{i}")(x, temb)
            if self.add_attention:
                x = SelfAttention2D(self.out_ch, name=f"attentions_{i}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_ch, name="upsamplers_0")(x)
        return x


class MidBlock2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, temb):
        x = ResnetBlock2D(self.channels, name="resnets_0")(x, temb)
        x = SelfAttention2D(self.channels, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, name="resnets_1")(x, temb)
        return x


class EncoderUNet(nn.Module):
    """prepare_unet_encoder equivalent (encoder_unet.py:137-161).

    Input: fused pixel+latent embedding at /8 (320 ch by default).
    Output: (y at /16 with ``out_ch`` channels, sem at /64 mid feature).
    """

    in_ch: int = 320
    out_ch: int = 512
    ch_config: Sequence[int] = (512, 768, 768)
    layers_per_block: int = 2

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ch0 = self.ch_config[0]

        # fixed t=999 conditioning (encoder_unet.py:76-87). The reference
        # constructs UNet2DModel with library-default time embedding:
        # flip_sin_to_cos=True, freq_shift=0 (diffusers 0.32 unet_2d.py).
        timesteps = jnp.full((x.shape[0],), 999, jnp.int32)
        t_emb = sinusoidal_time_embedding(
            timesteps, ch0, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = TimestepEmbedding(ch0 * 4, name="time_embedding")(t_emb)

        # replaced conv_in: 3 resnet blocks + stride-2 conv (/8 -> /16)
        h = ResnetBlockVQ(self.in_ch, ch0, name="conv_in_res0")(x)
        h = ResnetBlockVQ(ch0, ch0, name="conv_in_res1")(h)
        h = ResnetBlockVQ(ch0, ch0, name="conv_in_res2")(h)
        h = nn.Conv(ch0, (3, 3), strides=(2, 2), padding=1,
                    name="conv_in_down")(h)

        skips = [h]
        block_types = [True, True, False]  # AttnDown, AttnDown, Down
        n = len(self.ch_config)
        for i, ch in enumerate(self.ch_config):
            is_final = i == n - 1
            h, s = DownBlock2D(
                ch, self.layers_per_block, add_attention=block_types[i],
                add_downsample=not is_final, name=f"down_blocks_{i}")(h, temb)
            skips.extend(s)

        h = MidBlock2D(self.ch_config[-1], name="mid_block")(h, temb)
        sem = h  # /64 semantic feature (768 ch)

        # up_block_types=("AttnUpBlock2D","AttnUpBlock2D","UpBlock2D")
        # applied in order from the DEEPEST block (diffusers unet_2d.py
        # builds up_blocks[i] = up_block_types[i] starting right after
        # mid): attention at /64 and /32, plain at /16 — NOT a mirror of
        # the down path (attn at /16 and /32).
        up_types = [True, True, False]
        rev_ch = list(reversed(self.ch_config))
        for i, ch in enumerate(rev_ch):
            is_final = i == n - 1
            n_res = self.layers_per_block + 1
            blk_skips = [skips.pop() for _ in range(n_res)][::-1]
            h = UpBlock2D(
                ch, n_res, add_attention=up_types[i],
                add_upsample=not is_final, name=f"up_blocks_{i}")(h, blk_skips, temb)

        h = GroupNorm(32, 1e-5, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        y = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)
        return y, sem
