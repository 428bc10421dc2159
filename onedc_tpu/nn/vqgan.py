"""MaskGIT-VQGAN tokenizer (Flax/NHWC), frozen distillation target.

Re-implementation of the reference's hard-coded f16 VQGAN
(``src/modules/vqgan/maskgit_vqgan.py:355-392``: channel_mult
[1,1,2,2,4], hidden 128, 2 res blocks, z 256, codebook 1024x256).
Used only in stage-I training as the Codeformer's semantic target
(``model_sd15_with_codec_stage1.py:198-202,241-247``); takes [0,1] input.

The resnet block shares the reference's nin_shortcut-on-transformed-branch
quirk (see ``onedc_tpu/nn/blocks.py:ResnetBlockVQ``); downsampling is
2x2 avg-pool, upsampling nearest + conv.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import GroupNorm, ResnetBlockVQ, UpsampleConv2x


class VQGANEncoder(nn.Module):
    hidden: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden, (3, 3), padding="SAME", use_bias=False,
                    name="conv_in")(x)
        mults = (1,) + tuple(self.channel_mult)
        n = len(self.channel_mult)
        for i in range(n):
            block_out = self.hidden * self.channel_mult[i]
            for j in range(self.num_res_blocks):
                block_in = self.hidden * mults[i] if j == 0 else block_out
                h = ResnetBlockVQ(block_in, block_out,
                                  name=f"down_{i}_block_{j}")(h)
            if i != n - 1:
                h = nn.avg_pool(h, (2, 2), (2, 2))
        mid = self.hidden * self.channel_mult[-1]
        for j in range(self.num_res_blocks):
            h = ResnetBlockVQ(mid, mid, name=f"mid_{j}")(h)
        h = GroupNorm(32, 1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.z_channels, (1, 1), name="conv_out")(h)


class VQGANDecoder(nn.Module):
    hidden: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    out_channels: int = 3

    @nn.compact
    def __call__(self, z):
        block_in = self.hidden * self.channel_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", name="conv_in")(z)
        for j in range(self.num_res_blocks):
            h = ResnetBlockVQ(block_in, block_in, name=f"mid_{j}")(h)
        n = len(self.channel_mult)
        for i in reversed(range(n)):
            block_out = self.hidden * self.channel_mult[i]
            prev = (self.hidden * self.channel_mult[-1] if i == n - 1
                    else self.hidden * self.channel_mult[i + 1])
            for j in range(self.num_res_blocks):
                h = ResnetBlockVQ(prev if j == 0 else block_out, block_out,
                                  name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = UpsampleConv2x(block_out, name=f"up_{i}_conv")(h)
        h = GroupNorm(32, 1e-6, name="norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """Nearest-neighbor VQ with a (num_embeddings, dim) codebook
    (ref maskgit_vqgan.py:240-352)."""

    num_embeddings: int = 1024
    embedding_dim: int = 256

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.variance_scaling(
                1.0, "fan_in", "uniform"),
            (self.num_embeddings, self.embedding_dim))

    def __call__(self, h) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """h: (B,H,W,D) -> (quantized same shape, indices (B,H,W))."""
        flat = h.reshape(-1, self.embedding_dim)
        # |x - e|^2 = |x|^2 - 2 x.e + |e|^2
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ self.embedding.T
             + jnp.sum(self.embedding ** 2, 1)[None])
        idx = jnp.argmin(d, axis=1)
        quant = self.embedding[idx].reshape(h.shape)
        # straight-through for completeness (frozen in OneDC)
        quant = h + jax.lax.stop_gradient(quant - h)
        return quant, idx.reshape(h.shape[:-1])

    def get_codebook_entry(self, indices):
        return self.embedding[indices]

    def codebook(self):
        return self.embedding

    def get_soft_code(self, h, temp: float = 1.0):
        flat = h.reshape(-1, self.embedding_dim)
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ self.embedding.T
             + jnp.sum(self.embedding ** 2, 1)[None])
        soft = jax.nn.softmax(-d / temp, axis=-1)
        return soft.reshape(*h.shape[:-1], self.num_embeddings)


class MaskGitVQGAN(nn.Module):
    """Frozen tokenizer: encode [0,1] images to 1024-way code indices."""

    hidden: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    num_embeddings: int = 1024

    def setup(self):
        self.encoder = VQGANEncoder(self.hidden, self.channel_mult,
                                    self.num_res_blocks, self.z_channels)
        self.decoder = VQGANDecoder(self.hidden, self.channel_mult,
                                    self.num_res_blocks, self.z_channels)
        self.quantize = VectorQuantizer(self.num_embeddings, self.z_channels)

    def encode(self, x01) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[0,1] image -> (quantized latents, code indices)."""
        h = self.encoder(x01)
        return self.quantize(h)

    def decode(self, indices):
        quant = self.quantize.get_codebook_entry(indices)
        return jnp.clip(self.decoder(quant), 0.0, 1.0)

    def __call__(self, x01):
        return self.encode(x01)

    def codebook(self):
        """(K, D) codebook matrix (for distillation MSE targets)."""
        return self.quantize.codebook()

    def autoencode(self, x01):
        """encode -> decode; use as the init method so decoder params are
        created (``model.init(key, x, method=model.autoencode)``)."""
        _, idx = self.encode(x01)
        return self.decode(idx)
