"""Codeformer: stage-I semantic-distillation head.

Predicts MaskGIT-VQGAN code logits from the hyperprior semantic feature
(ref ``codec_module.py:472-511``): upsample y_semantic x2, 3 DualSwinBlocks
(window 16, first with absolute position embedding), conv-MLP head ->
1024-way logits. Trained with CE against frozen VQGAN indices + MSE against
the quantized latents (ref ``model_sd15_with_codec_stage1.py:241-262``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.blocks import DepthConvBlock4, GroupNorm, pixel_shuffle
from ..nn.swin import DualSwinBlock


class Codeformer(nn.Module):
    in_ch: int = 768
    codebook_size: int = 1024
    window_size: int = 16
    head_dim: int = 64

    @nn.compact
    def __call__(self, y_semantic):
        c = self.in_ch
        heads = c // self.head_dim
        mlp_dim = c * 4

        # upsample x2 (ref :475-480)
        h = DepthConvBlock4(c, c, name="up_block0")(y_semantic)
        h = nn.Conv(c * 4, (1, 1), name="up_expand")(h)
        h = pixel_shuffle(h, 2)
        h = DepthConvBlock4(c, c, name="up_block1")(h)

        h = DualSwinBlock(c, heads, self.head_dim, mlp_dim, self.window_size,
                          use_pos_embedding=True, name="swin0")(h)
        h = DualSwinBlock(c, heads, self.head_dim, mlp_dim, self.window_size,
                          use_pos_embedding=False, name="swin1")(h)
        h = DualSwinBlock(c, heads, self.head_dim, mlp_dim, self.window_size,
                          use_pos_embedding=False, name="swin2")(h)

        # conv-MLP head (ref :494-502); GroupNorm(16)
        h = nn.Conv(c * 4, (1, 1), name="head_0")(h)
        h = GroupNorm(16, 1e-5, name="head_norm0")(h)
        h = jax.nn.gelu(h, approximate=False)  # exact erf, like torch nn.GELU
        h = nn.Conv(c, (1, 1), name="head_3")(h)
        h = GroupNorm(16, 1e-5, name="head_norm1")(h)
        h = jax.nn.gelu(h, approximate=False)  # exact erf, like torch nn.GELU
        logits = nn.Conv(self.codebook_size, (1, 1), name="head_out")(h)
        probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs


class AuxDecoder(nn.Module):
    """Auxiliary latent decoder head (ref codec_module.py:458-469; defined
    by the reference but unused in shipped flows — kept for parity)."""

    in_ch: int = 256
    out_ch: int = 4

    @nn.compact
    def __call__(self, x):
        from ..nn.blocks import AttnBlockVQ, ResnetBlockVQ
        c = self.in_ch
        x = ResnetBlockVQ(c, name="res0")(x)
        x = ResnetBlockVQ(c, name="res1")(x)
        x = AttnBlockVQ(c, name="attn0")(x)
        x = ResnetBlockVQ(c, name="res2")(x)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(x)


def codeformer_losses(logits, probs, target_indices, target_quant,
                      codebook):
    """CE + MSE distillation losses (ref model_..._stage1.py:253-262).

    logits/probs: (B,h,w,K); target_indices: (B,h,w) int; target_quant:
    (B,h,w,D); codebook: (K,D).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(target_indices, logits.shape[-1],
                            dtype=logits.dtype)
    ce = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
    pred_quant = jnp.einsum("bhwk,kd->bhwd", probs, codebook)
    mse = jnp.mean((pred_quant - target_quant) ** 2)
    return ce, mse
