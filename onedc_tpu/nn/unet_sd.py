"""SD1.5-class conditional UNet, Flax/NHWC, as the one-step generator.

Re-implementation of the public Stable Diffusion 1.5 ``UNet2DConditionModel``
architecture with the OneDC modifications (ref ``decoder_unet.py:371-408``):

- ``conv_in`` replaced by a 3x3 conv taking the 320-ch codec control tensor
- added ``vae_reduction`` residual block producing the 4-ch pseudo "noisy
  latent" from the control tensor (decoder_unet.py:14-29, 98-100)
- forward returns ``(eps_prediction, reduced_sample)`` (decoder_unet.py:305)
- LoRA is merged into the base weights at load time (we never train the
  adapter separately at inference), see
  ``onedc_tpu/utils/port_torch.py:merge_lora``.

Cross-attention conditions on the (H/64 * W/64, 768) semantic tokens from
the hyperprior instead of text. Attention runs in the model dtype with
fp32 softmax accumulation; sequence lengths are tiny (<= a few hundred
tokens at 4K), so XLA's fused attention is already at the MXU roofline --
no custom kernel needed here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import multi_head_attention_bnhd
from .blocks import GroupNorm
from .unet_enc import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    sinusoidal_time_embedding,
)


class CrossAttention(nn.Module):
    """Multi-head attention; self- or cross- depending on context arg."""

    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]

        def split(t, length):
            return t.reshape(b, length, self.heads, self.head_dim)

        q, k, v = split(q, n), split(k, m), split(v, m)
        out = multi_head_attention_bnhd(q, k, v, self.head_dim ** -0.5)
        out = out.reshape(b, n, inner)
        return nn.Dense(self.query_dim, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # torch F.gelu defaults to the exact erf form; jax.nn.gelu to the
        # tanh approximation (~7e-4 abs divergence, caught by the UNet
        # value oracle) — match the reference exactly
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, name="net_0")(x)
        return nn.Dense(self.dim, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.dim, self.heads, self.head_dim,
                               name="attn1")(nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.dim, self.heads, self.head_dim,
                               self.context_dim,
                               name="attn2")(nn.LayerNorm(name="norm2")(x), context)
        x = x + FeedForward(self.dim, name="ff")(nn.LayerNorm(name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    """SpatialTransformer: GN + 1x1 conv proj in/out around the block(s).

    SD1.5 uses conv (not linear) projections and depth=1.
    """

    channels: int
    heads: int
    context_dim: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        xn = GroupNorm(32, 1e-6, name="norm")(x)
        xn = nn.Conv(c, (1, 1), name="proj_in")(xn)
        tokens = xn.reshape(b, h * w, c)
        head_dim = c // self.heads
        for i in range(self.depth):
            tokens = BasicTransformerBlock(
                c, self.heads, head_dim, self.context_dim,
                name=f"transformer_blocks_{i}")(tokens, context)
        xn = tokens.reshape(b, h, w, c)
        xn = nn.Conv(c, (1, 1), name="proj_out")(xn)
        return xn + residual


class CrossAttnDownBlock2D(nn.Module):
    out_ch: int
    heads: int
    context_dim: int
    num_layers: int = 2
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x, temb, context):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_ch, name=f"resnets_{i}")(x, temb)
            x = Transformer2D(self.out_ch, self.heads, self.context_dim,
                              name=f"attentions_{i}")(x, context)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_ch, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class PlainDownBlock2D(nn.Module):
    out_ch: int
    num_layers: int = 2
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x, temb):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_ch, name=f"resnets_{i}")(x, temb)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_ch, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock2D(nn.Module):
    out_ch: int
    heads: int
    context_dim: int
    num_layers: int = 3
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.num_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_ch, name=f"resnets_{i}")(x, temb)
            x = Transformer2D(self.out_ch, self.heads, self.context_dim,
                              name=f"attentions_{i}")(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_ch, name="upsamplers_0")(x)
        return x


class PlainUpBlock2D(nn.Module):
    out_ch: int
    num_layers: int = 3
    add_upsample: bool = True

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.num_layers):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(self.out_ch, name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_ch, name="upsamplers_0")(x)
        return x


class MidBlockCrossAttn(nn.Module):
    channels: int
    heads: int
    context_dim: int

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, name="resnets_0")(x, temb)
        x = Transformer2D(self.channels, self.heads, self.context_dim,
                          name="attentions_0")(x, context)
        x = ResnetBlock2D(self.channels, name="resnets_1")(x, temb)
        return x


class SD15UNet(nn.Module):
    """Standard SD1.5 UNet2DConditionModel (4-ch latent in/out, text
    cross-attention). Used as the DMD2 real/fake critic pair
    (ref ``src/modules/dmd/sd_guidance.py:56-94``).

    ``classify=True`` early-returns the mid-block feature for the GAN
    discriminator head (ref ``sd_unet_forward.py:257-259``).
    """

    in_ch: int = 4
    out_ch: int = 4
    block_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8
    context_dim: int = 768

    @nn.compact
    def __call__(self, sample, timesteps, context, classify: bool = False):
        ch = list(self.block_channels)
        heads = self.attention_head_dim

        t_emb = sinusoidal_time_embedding(
            timesteps, ch[0], flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(
            t_emb.astype(sample.dtype))

        h = nn.Conv(ch[0], (3, 3), padding=1, name="conv_in")(sample)
        skips = [h]
        for i, c in enumerate(ch):
            is_final = i == len(ch) - 1
            if not is_final:
                h, s = CrossAttnDownBlock2D(
                    c, heads, self.context_dim, self.layers_per_block,
                    add_downsample=True,
                    name=f"down_blocks_{i}")(h, temb, context)
            else:
                h, s = PlainDownBlock2D(
                    c, self.layers_per_block, add_downsample=False,
                    name=f"down_blocks_{i}")(h, temb)
            skips.extend(s)

        h = MidBlockCrossAttn(ch[-1], heads, self.context_dim,
                              name="mid_block")(h, temb, context)
        if classify:
            return h  # bottleneck feature for the GAN head

        rev = list(reversed(ch))
        for i, c in enumerate(rev):
            is_final = i == len(rev) - 1
            n_res = self.layers_per_block + 1
            blk = [skips.pop() for _ in range(n_res)][::-1]
            if i == 0:
                h = PlainUpBlock2D(c, n_res, add_upsample=True,
                                   name=f"up_blocks_{i}")(h, blk, temb)
            else:
                h = CrossAttnUpBlock2D(
                    c, heads, self.context_dim, n_res,
                    add_upsample=not is_final,
                    name=f"up_blocks_{i}")(h, blk, temb, context)

        h = GroupNorm(32, 1e-5, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)


class ReduceResblock(nn.Module):
    """vae_reduction: control tensor -> 4-ch pseudo noisy latent
    (decoder_unet.py:14-29)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(32, 1e-6, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.in_ch, (3, 3), padding=1, name="conv1")(h)
        h = GroupNorm(32, 1e-6, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        shortcut = nn.Conv(self.out_ch, (1, 1), name="short_cut")(x)
        return h + shortcut


class SD15CodecUNet(nn.Module):
    """UNet2DConditionModel(SD1.5) with codec control input.

    forward(sample at /8 with ``in_ch`` channels, timestep, context tokens)
    -> (eps prediction 4ch at /8, reduced_sample 4ch at /8)
    """

    in_ch: int = 320
    out_ch: int = 4
    vae_ch: int = 4
    block_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8  # SD1.5: heads = 8 at every resolution
    context_dim: int = 768

    @nn.compact
    def __call__(self, sample, timesteps, context) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ch = list(self.block_channels)
        heads = self.attention_head_dim  # SD1.5 config: 8 heads everywhere

        reduced = ReduceResblock(self.in_ch, self.vae_ch,
                                 name="vae_reduction")(sample)

        t_emb = sinusoidal_time_embedding(
            timesteps, ch[0], flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = TimestepEmbedding(ch[0] * 4, name="time_embedding")(
            t_emb.astype(sample.dtype))

        h = nn.Conv(ch[0], (3, 3), padding=1, name="conv_in")(sample)

        skips = [h]
        # down: CrossAttn x3 + plain (no downsample on the last)
        for i, c in enumerate(ch):
            is_final = i == len(ch) - 1
            if not is_final:
                h, s = CrossAttnDownBlock2D(
                    c, heads, self.context_dim, self.layers_per_block,
                    add_downsample=True, name=f"down_blocks_{i}")(h, temb, context)
            else:
                h, s = PlainDownBlock2D(
                    c, self.layers_per_block, add_downsample=False,
                    name=f"down_blocks_{i}")(h, temb)
            skips.extend(s)

        h = MidBlockCrossAttn(ch[-1], heads, self.context_dim,
                              name="mid_block")(h, temb, context)

        # up: plain + CrossAttn x3 (mirror)
        rev = list(reversed(ch))
        for i, c in enumerate(rev):
            is_final = i == len(rev) - 1
            n_res = self.layers_per_block + 1
            blk = [skips.pop() for _ in range(n_res)][::-1]
            if i == 0:
                h = PlainUpBlock2D(c, n_res, add_upsample=True,
                                   name=f"up_blocks_{i}")(h, blk, temb)
            else:
                h = CrossAttnUpBlock2D(
                    c, heads, self.context_dim, n_res,
                    add_upsample=not is_final,
                    name=f"up_blocks_{i}")(h, blk, temb, context)

        h = GroupNorm(32, 1e-5, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        eps = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)
        return eps, reduced
