"""Latent compression module (the "codec"): analysis/synthesis transforms,
FSQ-quantized hyperprior, four-part Gaussian conditional prior.

TPU-native re-design of the reference ``IntraNoAR``
(``src/models/sd15_onedc_codec_stage1/codec_module.py:51-455``):

- Flax/NHWC modules; the training forward (`__call__`) is one pure jitted
  function including the four-step masked prior (no Python-side state).
- Compression is split into a device program (`compress`) returning the
  write-plan arrays and a host bridge (see ``onedc_tpu/models/runtime.py``)
  that drives the C++ rANS coder.
- Decompression exposes the per-step device programs
  (`decompress_begin` / `decompress_scales` / `decompress_update` /
  `decompress_finish`) so the host rANS<->prior-net ping-pong
  (codec_module.py:418-454) stays thin and each step is one fused XLA
  computation.

Channel schema (defaults; ref codec_module.py:184-217):
pixel 3 -> pix_emb 192 @ /8 -> +cond 4 -> 320 -> encoder UNet -> 512 @ /16
-> trans_coding -> y 128 @ /16; hyperprior z 7ch @ /64 (FSQ [4]*7);
control output x_hat 320 @ /8; semantic y_semantic 768 @ /64.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.fourpart import (
    combine_quarters,
    decompress_step_update,
    forward_four_part_prior,
    forward_four_part_prior_recon_with_z,
    four_part_masks,
    separate_prior,
)
from ..entropy.gaussian import gaussian_bits
from ..nn.blocks import (
    AttnBlockVQ,
    BottleneckGroup,
    DepthConvBlock4,
    ResidualBlockUpsample,
    ResnetBlockVQ,
    UpsampleGroup,
)
from ..nn.fsq import FSQ
from ..nn.unet_enc import EncoderUNet


class CodecEncoder(nn.Module):
    """Analysis transform g_a (ref codec_module.py:51-85)."""

    in_ch: int = 3
    cond_ch: int = 4
    out_ch: int = 128
    unet_ch_config: Sequence[int] = (512, 768, 768)
    emb_ch: int = 192
    ctrl_ch: int = 320

    @nn.compact
    def __call__(self, x, cond) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ch_16x = self.unet_ch_config[0]
        x_emb = nn.Conv(self.emb_ch, (8, 8), strides=(8, 8), padding="VALID",
                        name="pix_emb")(x)
        x_emb = nn.Conv(self.ctrl_ch, (1, 1), name="pix_fusion")(
            jnp.concatenate([x_emb, cond], axis=-1))
        y, sem = EncoderUNet(self.ctrl_ch, ch_16x, self.unet_ch_config,
                             name="unet")(x_emb)
        y = BottleneckGroup(ch_16x, name="tc_bottleneck")(y)
        y = DepthConvBlock4(ch_16x, ch_16x, name="tc_block0")(y)
        y = DepthConvBlock4(ch_16x, self.out_ch, name="tc_block1")(y)
        return y, sem


class CodecDecoder(nn.Module):
    """Synthesis transform g_s -> 320ch control tensor
    (ref codec_module.py:88-116)."""

    in_ch: int = 128
    internal_ch: int = 512
    semantic_ch: int = 768
    out_ch: int = 320

    @nn.compact
    def __call__(self, y_hat, sem_hat):
        ch_16x = self.internal_ch
        ch_8x = self.internal_ch // 2

        h = DepthConvBlock4(self.in_ch, ch_16x, name="tc_block0")(y_hat)
        h = DepthConvBlock4(ch_16x, ch_16x, name="tc_block1")(h)
        for i in range(3):
            h = ResnetBlockVQ(ch_16x, name=f"res16_{i}")(h)
        h = UpsampleGroup(ch_16x, ch_8x, name="up")(h)
        for i in range(3):
            h = ResnetBlockVQ(ch_8x, name=f"res8_{i}")(h)

        s = ResidualBlockUpsample(self.semantic_ch, ch_16x, name="sem_up0")(sem_hat)
        s = DepthConvBlock4(ch_16x, ch_16x, name="sem_block0")(s)
        s = ResidualBlockUpsample(ch_16x, ch_8x, name="sem_up1")(s)
        s = DepthConvBlock4(ch_8x, ch_8x, name="sem_block1")(s)
        s = ResidualBlockUpsample(ch_8x, ch_8x, name="sem_up2")(s)

        out = jnp.concatenate([h, s], axis=-1)
        return DepthConvBlock4(ch_8x * 2, self.out_ch, name="conv_out")(out)


class HyperEncoder(nn.Module):
    """y (/16) + sem (/64) -> z (/64, len(fsq_levels) ch)
    (ref codec_module.py:119-142)."""

    y_ch: int = 128
    sem_ch: int = 768
    internal_ch: int = 512
    z_ch: int = 7

    @nn.compact
    def __call__(self, y, sem):
        h = DepthConvBlock4(self.y_ch, self.y_ch, name="ytc_block0")(y)
        h = nn.Conv(self.y_ch, (3, 3), strides=(2, 2), padding=1,
                    name="ytc_down0")(h)
        h = DepthConvBlock4(self.y_ch, self.y_ch, name="ytc_block1")(h)
        h = nn.Conv(self.y_ch, (3, 3), strides=(2, 2), padding=1,
                    name="ytc_down1")(h)
        h = jnp.concatenate([h, sem], axis=-1)
        h = DepthConvBlock4(self.y_ch + self.sem_ch, self.sem_ch,
                            name="fusion_block0")(h)
        h = AttnBlockVQ(self.sem_ch, name="fusion_attn0")(h)
        h = DepthConvBlock4(self.sem_ch, self.internal_ch,
                            name="fusion_block1")(h)
        h = AttnBlockVQ(self.internal_ch, name="fusion_attn1")(h)
        h = DepthConvBlock4(self.internal_ch, self.internal_ch,
                            name="fusion_block2")(h)
        return nn.Conv(self.z_ch, (1, 1), name="fusion_out")(h)


class HyperDecoder(nn.Module):
    """z_hat -> (entropy params branch @ /16, z_semantic tap @ /64)
    (ref codec_module.py:145-166)."""

    entropy_ch: int = 128
    z_ch: int = 7

    @nn.compact
    def __call__(self, z_hat):
        h = nn.Conv(self.entropy_ch, (1, 1), name="feat_in")(z_hat)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        z_semantic = h
        c = self.entropy_ch
        h = DepthConvBlock4(c, c, name="ent_block0")(h)
        h = ResidualBlockUpsample(c, c, name="ent_up0")(h)
        h = DepthConvBlock4(c, c, name="ent_block1")(h)
        h = ResidualBlockUpsample(c, c, name="ent_up1")(h)
        h = DepthConvBlock4(c, c, name="ent_block2")(h)
        return h, z_semantic


class SemanticAdaptor(nn.Module):
    """z_semantic (128 @ /64) -> y_semantic (768 @ /64): the UNet
    cross-attention guidance (ref codec_module.py:169-181)."""

    entropy_ch: int = 128
    semantic_ch: int = 768

    @nn.compact
    def __call__(self, x):
        c = self.semantic_ch
        h = DepthConvBlock4(self.entropy_ch, c, name="block_in")(x)
        for g in range(2):
            h = ResnetBlockVQ(c, name=f"g{g}_res0")(h)
            h = AttnBlockVQ(c, name=f"g{g}_attn0")(h)
            h = AttnBlockVQ(c, name=f"g{g}_attn1")(h)
        return DepthConvBlock4(c, c, name="block_out")(h)


class PriorFusion(nn.Module):
    """y_prior_fusion: hyper params 128 -> 256 (ref codec_module.py:205-208)."""

    n: int = 128

    @nn.compact
    def __call__(self, x):
        x = DepthConvBlock4(self.n, self.n * 2, name="block0")(x)
        return DepthConvBlock4(self.n * 2, self.n * 2, name="block1")(x)


class SpatialPrior(nn.Module):
    """Shared 3-block spatial prior net (ref codec_module.py:213-217)."""

    n: int = 128

    @nn.compact
    def __call__(self, x):
        c = self.n * 2
        x = DepthConvBlock4(c, c, name="block0")(x)
        x = DepthConvBlock4(c, c, name="block1")(x)
        return DepthConvBlock4(c, c, name="block2")(x)


class LatentCodec(nn.Module):
    """IntraNoAR equivalent: full latent codec (ref codec_module.py:184-455).

    Pure-function methods; host-side rANS/bitstream orchestration lives in
    ``onedc_tpu/models/runtime.py``.
    """

    cond_ch: int = 4
    ctrl_ch: int = 320
    internal_ch: int = 512
    bottleneck_ch: int = 128
    unet_ch_config: Sequence[int] = (512, 768, 768)
    z_fsq_levels: Sequence[int] = (4, 4, 4, 4, 4, 4, 4)
    force_zero_thres: Optional[float] = None
    z_only: bool = False  # extreme-low-bpp variant: y_hat = predicted means
    # inference compute dtype (e.g. jnp.bfloat16). FSQ codes and inputs
    # are f32 by construction; without an explicit cast flax's dtype
    # promotion silently upgrades every downstream conv to f32 (round 1
    # shipped that way -- the "bf16" decode ran mostly f32 on the MXU).
    compute_dtype: Optional[Any] = None

    ds: int = 64       # padding granularity
    cond_ds: int = 8   # control-tensor stride

    def _cast(self, *xs):
        if self.compute_dtype is None:
            return xs if len(xs) > 1 else xs[0]
        out = tuple(x.astype(self.compute_dtype) for x in xs)
        return out if len(out) > 1 else out[0]

    def setup(self):
        n = self.bottleneck_ch
        sem_ch = self.unet_ch_config[-1]
        self.enc = CodecEncoder(3, self.cond_ch, n, self.unet_ch_config,
                                ctrl_ch=self.ctrl_ch)
        self.dec = CodecDecoder(n, self.internal_ch, sem_ch, self.ctrl_ch)
        self.semantic_adaptor = SemanticAdaptor(n, sem_ch)
        self.hyper_enc = HyperEncoder(n, sem_ch, self.internal_ch,
                                      len(self.z_fsq_levels))
        self.hyper_dec = HyperDecoder(n, len(self.z_fsq_levels))
        self.z_vq = FSQ(self.z_fsq_levels)
        self.y_prior_fusion = PriorFusion(n)
        self.y_spatial_prior_reduction = nn.Conv(n, (1, 1),
                                                 name="y_spatial_prior_reduction")
        self.y_spatial_prior_adaptors = [
            DepthConvBlock4(n * 2, n * 2, name=f"y_spatial_prior_adaptor_{i}")
            for i in (1, 2, 3)
        ]
        self.y_spatial_prior = SpatialPrior(n)

    # -- functional prior step helpers --------------------------------------

    def _prior_steps(self):
        return [
            lambda p, i=i: self.y_spatial_prior(self.y_spatial_prior_adaptors[i](p))
            for i in range(3)
        ]

    # -- training / eval forward --------------------------------------------

    def __call__(self, x, cond, training: bool = False,
                 noise_rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """Full RD forward. x: (B,H,W,3) padded to x64; cond: VAE latent /8."""
        b, h, w, _ = x.shape
        pixel_num = h * w

        y, sem = self.enc(x, cond)
        z = self.hyper_enc(y, sem)
        z_hat, z_indices = self.z_vq(z)

        params, z_semantic = self.hyper_dec(z_hat)
        params = self.y_prior_fusion(params)

        if self.z_only:
            y_hat = forward_four_part_prior_recon_with_z(
                y, params, self._prior_steps(),
                reduction=self.y_spatial_prior_reduction)
            y_res = y_q = jnp.zeros_like(y)
            scales_hat = jnp.ones_like(y)
        else:
            y_res, y_q, y_hat, scales_hat = forward_four_part_prior(
                y, params, self._prior_steps(),
                reduction=self.y_spatial_prior_reduction,
                training=training, force_zero_thres=self.force_zero_thres)

        y_semantic = self.semantic_adaptor(z_semantic)
        x_hat = self.dec(y_hat, y_semantic)

        if training and noise_rng is not None:
            y_for_bit = y_res + jax.random.uniform(
                noise_rng, y_res.shape, y_res.dtype, -0.5, 0.5)
        else:
            y_for_bit = y_q
        bits_y = gaussian_bits(y_for_bit, scales_hat, training=training)
        bpp_y = jnp.mean(jnp.sum(bits_y, axis=(1, 2, 3)) / pixel_num)
        bits_hard = gaussian_bits(jax.lax.stop_gradient(y_q), scales_hat,
                                  training=training)
        bpp_hard_y = jnp.mean(jnp.sum(bits_hard, axis=(1, 2, 3)) / pixel_num)

        return {
            "x_hat": x_hat,
            "y_hat": y_hat,
            "bit": bpp_y * pixel_num,
            "bpp": bpp_y,
            "bpp_y": bpp_y,
            "bpp_hard_y": bpp_hard_y,
            "y_semantic": y_semantic,
            "z_semantic": z_semantic,
            "z_indices": z_indices,
        }

    # -- compress-side device program ---------------------------------------

    def compress(self, x, cond) -> Dict[str, Any]:
        """Device half of encode: all NN work + write-plan arrays.

        Returns y_q_w/scales_w (4 x (B,H/16,W/16,C/4)) for the host rANS
        coder and the FSQ indices for the z stream (ref codec_module.py:
        372-415).
        """
        x, cond = self._cast(x, cond)
        y, sem = self.enc(x, cond)
        z = self.hyper_enc(y, sem)
        z_hat, z_indices = self.z_vq(z)
        z_hat = self._cast(z_hat)

        params, z_semantic = self.hyper_dec(z_hat)
        params = self.y_prior_fusion(params)
        y_q_w, scales_w, y_hat = forward_four_part_prior(
            y, params, self._prior_steps(),
            reduction=self.y_spatial_prior_reduction,
            training=False, force_zero_thres=self.force_zero_thres,
            write=True)
        # rANS write plan ships integer CDF indexes, not f32 scales: the
        # index map runs on device (entropy/gaussian.py:build_indexes) so
        # the host transfer shrinks and the integer decision is identical
        # between the compress and decompress programs' f32 math. Indexes
        # are 0..255 (uint8) unless force_zero_thres needs -1 (int16).
        indexes_w = tuple(self._rans_indexes(s) for s in scales_w)
        return {
            "y_q_w": y_q_w,
            "indexes_w": indexes_w,
            "y_hat": y_hat,
            "z_indices": z_indices,
        }

    # -- decompress-side device programs ------------------------------------
    #
    # The host loop alternates rANS decode (step i) with the prior net for
    # step i+1. Device work per step:
    #   begin:   z indices -> params/semantic + step-0 scales
    #   update:  y_q_r -> y_hat accumulation + step-(i+1) scales
    #   finish:  y_hat -> (x_hat control, y_semantic)

    def decompress_begin(self, z_indices):
        z_hat = self._cast(self.z_vq.indices_to_codes(z_indices))
        params, z_semantic = self.hyper_dec(z_hat)
        params = self.y_prior_fusion(params)
        scales, means = separate_prior(params)
        common = self.y_spatial_prior_reduction(params)
        b, h, w, c = means.shape
        masks = four_part_masks(h, w, c, means.dtype)
        scales_r = combine_quarters(scales * masks[0])
        return {
            "common": common,
            "z_semantic": z_semantic,
            "means": means,
            "indexes_r": self._rans_indexes(scales_r),
            "y_hat": jnp.zeros_like(means),
        }

    def _rans_indexes(self, scales_r):
        """CDF indexes in the smallest dtype that fits: uint8 (0..255)
        normally, int16 when force_zero_thres can emit -1 skip markers.
        This is THE hot device->host transfer of the serial four-part
        decode loop (4 fetches per image); halving it matters through a
        high-latency host link."""
        from ..entropy.gaussian import build_indexes
        idx = build_indexes(scales_r, self.force_zero_thres)
        dtype = jnp.int16 if self.force_zero_thres is not None else jnp.uint8
        return idx.astype(dtype)

    def decompress_update(self, step: int, y_q_r, means, y_hat_so_far, common):
        """Fold in decoded symbols of `step`, emit scales for step+1.

        `step` is a static Python int (0..3); each value compiles once.
        """
        y_q_r = y_q_r.astype(means.dtype)
        b, h, w, c = means.shape
        masks = four_part_masks(h, w, c, means.dtype)
        y_hat = decompress_step_update(y_q_r, means, masks[step], y_hat_so_far)
        if step == 3:
            return {"y_hat": y_hat, "means": means, "indexes_r": None}
        params = jnp.concatenate([y_hat, common], axis=-1)
        nxt = self.y_spatial_prior(self.y_spatial_prior_adaptors[step](params))
        scales, means = separate_prior(nxt)
        scales_r = combine_quarters(scales * masks[step + 1])
        return {"y_hat": y_hat, "means": means,
                "indexes_r": self._rans_indexes(scales_r)}

    def decompress_finish(self, y_hat, z_semantic):
        y_semantic = self.semantic_adaptor(z_semantic)
        x_hat = self.dec(y_hat, y_semantic)
        return x_hat, y_semantic

    # z-only decode: no y bitstream at all (ref z_only/codec_module.py)
    def decompress_z_only(self, z_indices):
        z_hat = self._cast(self.z_vq.indices_to_codes(z_indices))
        params, z_semantic = self.hyper_dec(z_hat)
        params = self.y_prior_fusion(params)
        y_hat = forward_four_part_prior_recon_with_z(
            jnp.zeros_like(separate_prior(params)[0]), params,
            self._prior_steps(), reduction=self.y_spatial_prior_reduction)
        return self.decompress_finish(y_hat, z_semantic)
