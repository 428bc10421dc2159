"""OneDC composite model: latent codec + one-step SD UNet + VAE.

Equivalent of the reference ``SD15_1step_codec_stage1``
(``src/models/sd15_onedc_codec_stage1/model_sd15_with_codec_stage1.py``):

- training forward: image -> VAE latent (frozen) -> codec RD forward ->
  one-step UNet -> x0 -> VAE decode -> predicted image (+ RD stats)
- encode: pad to x64 (replicate), VAE-encode the cond latent, codec encode
- decode: codec decode -> UNet one step at t=999 -> x0 -> VAE decode ->
  unpad

All device work is pure Flax; the bitstream paths live in
``OneDCRuntime`` below (wrapping ``CodecRuntime``).

TPU-first deviations from the reference, by design:
- NHWC layouts, one fused jit program per stage (no eval-mode Python loops)
- x0 recovery in f32 instead of f64 (see ``onedc_tpu/nn/diffusion.py``)
- VAE encode uses the distribution mean by default (deterministic encode);
  pass ``sample_posterior=True`` + rng for the reference's sampling
  behavior (model_..._stage1.py:193 uses .sample()).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.framing import get_padding_size
from ..nn.diffusion import get_x0_from_noise, make_alphas_cumprod
from ..nn.unet_sd import SD15CodecUNet
from ..nn.vae import AutoencoderKL
from .codec import LatentCodec
from .runtime import CodecRuntime


class OneDC(nn.Module):
    """Composite device model. Submodules: vae / unet / codec."""

    # codec config (ref configs/...stage1 yaml)
    internal_ch: int = 512
    bottleneck_ch: int = 128
    unet_ch_config: Sequence[int] = (512, 768, 768)
    z_fsq_levels: Sequence[int] = (4, 4, 4, 4, 4, 4, 4)
    z_only: bool = False
    force_zero_thres: Optional[float] = None
    # generator config
    ctrl_ch: int = 320
    vae_ch: int = 4
    sd_block_channels: Sequence[int] = (320, 640, 1280, 1280)
    context_dim: int = 768
    # vae config (SD2.1 VAE)
    vae_block_channels: Sequence[int] = (128, 256, 512, 512)
    vae_attn_patch: int = 16
    vae_scaling_factor: float = 0.18215
    # use_large_vae=False decodes through the taesd TinyVAE (scaling 1.0)
    # while ENCODE stays on the large VAE encoder — exactly the
    # reference's flag semantics (model_..._stage1.py:39-54,184-195).
    # ~45 ms of the 768px decode is the large VAE decoder (ROADMAP).
    use_large_vae: bool = True
    tiny_vae_ch: int = 64
    conditioning_timestep: int = 999
    num_train_timesteps: int = 1000
    # codeformer semantic distillation (stage-I only; ref
    # model_..._stage1.py:91-101,241-262). The frozen MaskGIT-VQGAN
    # tokenizes the half-res image; the Codeformer predicts those codes
    # from y_semantic, distilling semantics into the hyperprior.
    use_codeformer: bool = False
    codeformer_codebook: int = 1024
    codeformer_window: int = 16
    vqgan_hidden: int = 128
    # inference compute dtype (jnp.bfloat16 for serving); None keeps f32.
    # Must be set on the MODEL (not only the params): FSQ codes/images are
    # f32 sources and flax promotion would upgrade the whole pipeline.
    compute_dtype: Optional[Any] = None

    def setup(self):
        self.vae = AutoencoderKL(self.vae_block_channels, self.vae_ch,
                                 self.vae_attn_patch, self.vae_scaling_factor)
        self.unet = SD15CodecUNet(
            in_ch=self.ctrl_ch, out_ch=self.vae_ch, vae_ch=self.vae_ch,
            block_channels=self.sd_block_channels,
            context_dim=self.context_dim)
        self.codec = LatentCodec(
            cond_ch=self.vae_ch, ctrl_ch=self.ctrl_ch,
            internal_ch=self.internal_ch, bottleneck_ch=self.bottleneck_ch,
            unet_ch_config=self.unet_ch_config,
            z_fsq_levels=self.z_fsq_levels, z_only=self.z_only,
            force_zero_thres=self.force_zero_thres,
            compute_dtype=self.compute_dtype)
        self.alphas_cumprod = make_alphas_cumprod(self.num_train_timesteps)
        if not self.use_large_vae:
            from ..nn.vae import TinyVaeDecoder
            self.vae_tiny_dec = TinyVaeDecoder(ch=self.tiny_vae_ch)
        if self.use_codeformer:
            from ..nn.vqgan import MaskGitVQGAN
            from .codeformer import Codeformer
            self.codeformer = Codeformer(
                in_ch=self.context_dim,
                codebook_size=self.codeformer_codebook,
                window_size=self.codeformer_window)
            self.vqgan = MaskGitVQGAN(hidden=self.vqgan_hidden,
                                      num_embeddings=self.codeformer_codebook)

    # -- VAE helpers (ref model_..._stage1.py:184-195) ----------------------

    def vae_encode_image(self, image, rng=None, sample_posterior=False):
        mean, logvar = self.vae.encode(image)
        if sample_posterior and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        else:
            z = mean
        return jax.lax.stop_gradient(z * self.vae_scaling_factor)

    def vae_decode_image(self, latents):
        if not self.use_large_vae:
            # taesd config.scaling_factor == 1.0: latents pass unscaled
            return self.vae_tiny_dec(latents)
        return self.vae.decode(latents / self.vae_scaling_factor)

    # -- one-step generation -------------------------------------------------

    def generate(self, x_hat, y_semantic):
        """Control tensor + semantic tokens -> predicted image in [-1,1].

        The UNet runs one step at t=999; x0 is recovered from the
        vae_reduction pseudo-latent (ref model_..._stage1.py:312-324).
        """
        x0 = self._one_step_x0(x_hat, y_semantic)
        # x0 stays f32 (tiny alpha-bar at t=999 -> precision-critical,
        # see nn/diffusion.py), but the VAE decode runs in the pipeline's
        # working dtype (bf16 at inference): round 1 silently promoted
        # the whole VAE decoder to f32 through this boundary.
        return self.vae_decode_image(x0.astype(x_hat.dtype)), x0

    def _one_step_x0(self, x_hat, y_semantic):
        """Shared one-step UNet + x0 recovery (kept single-sourced so the
        serial ``generate`` and the pipelined ``decode_device_x0`` cannot
        drift apart on the precision-critical x0 handling)."""
        b = x_hat.shape[0]
        if y_semantic.ndim == 4:  # (B,H,W,C) -> (B, HW, C) cross-attn tokens
            tokens = y_semantic.reshape(b, -1, y_semantic.shape[-1])
        else:
            tokens = y_semantic
        t = jnp.full((b,), self.conditioning_timestep, jnp.int32)
        eps, reduced = self.unet(x_hat, t, tokens)
        return get_x0_from_noise(reduced, eps, self.alphas_cumprod, t)

    # -- training forward (ref model_..._stage1.py:233-272) ------------------

    def __call__(self, image, training: bool = False,
                 noise_rng: Optional[jax.Array] = None,
                 fix_encoder: bool = False) -> Tuple[Dict[str, Any], jnp.ndarray]:
        x_latent = self.vae_encode_image(image)
        enc_dict = self.codec(image, x_latent, training=training,
                              noise_rng=noise_rng)
        pred_image, x0 = self.generate(enc_dict["x_hat"],
                                       enc_dict["y_semantic"])
        enc_dict["x_latent"] = x_latent
        enc_dict["x_latent_recon"] = x0
        if self.use_codeformer:
            # semantic distillation (ref model_..._stage1.py:241-262):
            # frozen VQGAN tokenizes the half-res image ([0,1] input);
            # Codeformer predicts the codes from y_semantic. Gradients
            # flow into both the codeformer AND the hyperprior branch.
            from .codeformer import codeformer_losses
            b, h, w, _ = image.shape
            small = jax.image.resize(image, (b, h // 2, w // 2, 3),
                                     method="bilinear")
            quant, idx = self.vqgan.encode(small * 0.5 + 0.5)
            quant = jax.lax.stop_gradient(quant)
            idx = jax.lax.stop_gradient(idx)
            logits, probs = self.codeformer(enc_dict["y_semantic"])
            ce, mse = codeformer_losses(
                logits, probs, idx, quant,
                jax.lax.stop_gradient(self.vqgan.codebook()))
            enc_dict["code_ce_loss"] = ce
            enc_dict["code_mse_loss"] = mse
        return enc_dict, pred_image

    # -- encode/decode device halves ----------------------------------------

    def encode_device(self, image_padded):
        """VAE cond + codec compress arrays, one fused program."""
        x_latent = self.vae_encode_image(image_padded)
        return self.codec.compress(image_padded, x_latent)

    def codec_decompress_begin(self, z_indices):
        return self.codec.decompress_begin(z_indices)

    def codec_decompress_update(self, step, y_q_r, means, y_hat, common):
        return self.codec.decompress_update(step, y_q_r, means, y_hat, common)

    def decode_device(self, y_hat, z_semantic):
        """y_hat + z_semantic -> final image, one fused program."""
        x_hat, y_semantic = self.codec.decompress_finish(y_hat, z_semantic)
        pred_image, _ = self.generate(x_hat, y_semantic)
        return pred_image

    # staged halves of decode_device for the pipelined serving path: the
    # host dispatches stage A (codec finish + UNet -> x0) and stage B
    # (VAE decode) of image i BETWEEN the four-part prior updates of
    # image i+1, so the rANS host work of i+1 executes while the device
    # chews on i's NN stages (single serial device queue — overlap comes
    # from dispatch ORDER, see OneDCRuntime._decode_bucket_pipelined).
    # The split costs one tiny x0 (B,H/8,W/8,4) HBM round trip.

    def decode_device_x0(self, y_hat, z_semantic):
        x_hat, y_semantic = self.codec.decompress_finish(y_hat, z_semantic)
        return self._one_step_x0(x_hat, y_semantic).astype(x_hat.dtype)

    def decode_device_vae(self, x0):
        return self.vae_decode_image(x0)

    def decode_device_z_only(self, z_indices):
        x_hat, y_semantic = self.codec.decompress_z_only(z_indices)
        pred_image, _ = self.generate(x_hat, y_semantic)
        return pred_image


class OneDCRuntime:
    """Host orchestration: padding, bitstream, jit cache.

    API mirrors the reference top-level model: ``encode(image, fp)`` ->
    (stream, bpp_dict); ``decode(fp|stream)`` -> image (unpadded, [-1,1]).
    Images are NHWC jnp arrays in [-1, 1].
    """

    def __init__(self, model: OneDC, params, dtype=None,
                 quant: Optional[str] = None, vae: Optional[str] = None):
        """``dtype=jnp.bfloat16`` casts params once for bf16 inference —
        the counterpart of the reference's bf16 autocast context
        (model_..._stage1.py:117). Compress and decompress run the same
        program, so quantization decisions stay consistent.

        ``quant="w8a8"`` additionally runs the DECODE programs' quality
        stages (UNet / VAE decoder / TinyVAE) as dynamic int8 on the MXU
        (see ``onedc_tpu/nn/quant.py``). Encode and every entropy-
        critical codec net stay exact, so bitstreams from a quantized
        runtime decode identically on an unquantized one.

        ``vae="tiny"`` decodes through the taesd TinyVAE (the
        reference's ``use_large_vae=False``, model_..._stage1.py:39-54)
        while ENCODE stays on the large VAE encoder — a first-class
        serving mode like w8a8 (composes with it; carried by the AOT
        bundle). ``params`` must contain the ``vae_tiny_dec`` subtree —
        graft one with ``ensure_tiny_vae_params``. ``vae="large"``
        forces the large decoder; None keeps the model's flag."""
        if vae not in (None, "large", "tiny"):
            raise ValueError(f"unknown vae mode {vae!r}")
        if vae is not None and model.use_large_vae != (vae == "large"):
            model = model.clone(use_large_vae=(vae == "large"))
        if not model.use_large_vae:
            assert "vae_tiny_dec" in params["params"], (
                "vae='tiny' needs vae_tiny_dec params — see "
                "ensure_tiny_vae_params")
        if dtype is not None:
            # one jitted program: an astype dispatch per leaf costs
            # ~ms of RPC each on remote/1-core hosts (~10^3 leaves)
            params = jax.jit(lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                t))(params)
            if model.compute_dtype != dtype:
                model = model.clone(compute_dtype=dtype)
        self.model = model
        self.dtype = dtype if dtype is not None else model.compute_dtype
        self.params = params
        codec_def = LatentCodec(
            cond_ch=model.vae_ch, ctrl_ch=model.ctrl_ch,
            internal_ch=model.internal_ch,
            bottleneck_ch=model.bottleneck_ch,
            unet_ch_config=model.unet_ch_config,
            z_fsq_levels=model.z_fsq_levels, z_only=model.z_only,
            force_zero_thres=model.force_zero_thres,
            compute_dtype=model.compute_dtype)
        # reuse CodecRuntime's entropy-coder machinery with our params
        # scoped to the codec submodule
        self._codec_rt = CodecRuntime(
            codec_def, {"params": params["params"]["codec"]})
        self.ds = codec_def.ds

        if quant not in (None, "w8a8"):
            raise ValueError(f"unknown quant mode {quant!r}")
        self.quant = quant

        def _program(method):
            from ..nn.quant import quant_methods

            def f(p, *a):
                with quant_methods(quant):
                    return model.apply(p, *a, method=method)
            return jax.jit(f)

        # encode stays exact in every mode: quantization decisions on
        # the entropy path must be identical across encoder and decoder
        self._encode_dev = jax.jit(lambda p, x: model.apply(
            p, x, method=model.encode_device))
        self._decode_dev = _program(model.decode_device)
        self._decode_z_only = _program(model.decode_device_z_only)
        # staged halves for the pipelined serving path
        self._decode_x0 = _program(model.decode_device_x0)
        self._decode_vae = _program(model.decode_device_vae)

    def update(self, force: bool = False):
        self._codec_rt.update(force)

    def set_params(self, params):
        """Swap weights without re-jitting: the compiled programs take
        params as an argument, so same-structure/shape/dtype trees reuse
        every cached executable (bench stream calibration, checkpoint
        hot-reload)."""
        self.params = params
        self._codec_rt.params = {"params": params["params"]["codec"]}

    @staticmethod
    def _pad_replicate(image, pad):
        pl, pr, pt, pb = pad
        return jnp.pad(image, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                       mode="edge")

    def encode(self, image, fp=None, caption: str = ""):
        """image (1,H,W,3) in [-1,1] -> (stream bytes, bpp dict).
        ``caption`` rides the container (ref entropy/utils.py:95-105)."""
        _, h, w, _ = image.shape
        pad = get_padding_size(h, w, self.ds)
        if self.dtype is not None:
            image = image.astype(self.dtype)
        image_padded = self._pad_replicate(image, pad)
        out = self._encode_dev(self.params, image_padded)

        rt = self._codec_rt
        if self.model.z_only:
            return rt.encode_z_only(out["z_indices"], w, h, fp=fp,
                                    caption=caption)
        return rt.write_streams(out, w, h, fp, caption=caption)

    def decode(self, fp=None, stream: Optional[bytes] = None):
        """Stream/file -> reconstructed image (1,H,W,3) in [-1,1]."""
        from ..entropy.framing import decode_i, read_from_file
        assert fp or stream
        data = stream if stream is not None else read_from_file(fp)
        rt = self._codec_rt
        dec = decode_i(data, rt.fsq.index_bits, self.ds)
        zh, zw = dec["pad_height"] // self.ds, dec["pad_width"] // self.ds
        z_indices = jnp.asarray(rt.fsq.unpack_indices(
            dec["bit_stream_z"], zh * zw).reshape(1, zh, zw))

        if self.model.z_only:
            pred = self._decode_z_only(self.params, z_indices)
        else:
            assert rt.entropy_coder is not None, "call update() first"
            rt.entropy_coder.set_stream(dec["bit_stream_y"])
            y_hat, z_semantic = rt.run_four_part_decode(
                z_indices, [rt.gaussian_coder])
            pred = self._decode_dev(self.params, y_hat, z_semantic)

        pl, pr, pt, pb = dec["pad_tuple"]
        h, w = dec["pad_height"] - pt - pb, dec["pad_width"] - pl - pr
        return pred[:, pt:pt + h, pl:pl + w, :].astype(jnp.float32)

    # -- batched encode/decode (serving + tiled 4K paths) ---------------------

    def _batch_sharding(self, mesh):
        if mesh is None:
            return None, 1
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        return (NamedSharding(mesh, P(DATA_AXIS)),
                mesh.shape[DATA_AXIS])

    @staticmethod
    def _pad_batch(arr, multiple: int):
        n = arr.shape[0]
        rem = (-n) % multiple
        if rem:
            arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)])
        return arr

    def encode_batch(self, images, mesh=None):
        """Encode N same-size images/tiles as ONE device batch (optionally
        sharded over the mesh data axis), then write one container per
        image on the host. Returns a list of (stream, bpp_dict)."""
        rt = self._codec_rt
        n, h, w, _ = images.shape
        pad = get_padding_size(h, w, self.ds)
        images = jnp.asarray(images)
        if self.dtype is not None:
            images = images.astype(self.dtype)
        batch = self._pad_replicate(images, pad)

        sharding, mult = self._batch_sharding(mesh)
        if n % mult:  # grow to a shardable batch (host detour only then)
            batch = jnp.asarray(self._pad_batch(np.asarray(batch), mult))
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        out = self._encode_dev(self.params, batch)

        return self._write_chunk_streams(rt, out, list(range(n)),
                                         [None] * n, w, h, [""] * n)

    def _write_chunk_streams(self, rt, out, sel, results, w, h, caps):
        """Host half of a batched encode: fetch each device array ONCE
        (not one tunnel round trip per image slice), then write one
        container per REAL image. ``sel``: result slots for rows 0..len-1
        of ``out`` (padding rows are dropped)."""
        if self.model.z_only:
            z = np.asarray(out["z_indices"])
            for j, i in enumerate(sel):
                results[i] = rt.encode_z_only(z[j:j + 1], w, h,
                                              caption=caps[j])
            return results
        y_q_w = [np.asarray(a) for a in out["y_q_w"]]
        idx_w = [np.asarray(a) for a in out["indexes_w"]]
        z = np.asarray(out["z_indices"])
        for j, i in enumerate(sel):
            per = {
                "y_q_w": [a[j:j + 1] for a in y_q_w],
                "indexes_w": [a[j:j + 1] for a in idx_w],
                "z_indices": z[j:j + 1],
            }
            results[i] = rt.write_streams(per, w, h, caption=caps[j])
        return results

    def encode_many(self, images, captions=None, chunk: Optional[int] = None):
        """Serving twin of ``decode_batch`` for the encode side: a list of
        (1,H,W,3) images is bucketed by size, encoded in device chunks
        that are ALL dispatched before any host work (async device->host
        fetches issued at dispatch time), then the host rANS-codes and
        frames each container while the device is still encoding later
        chunks. Unlike decode there is no serial ping-pong, so this is a
        plain dispatch-ahead pipeline. Returns [(stream, bpp_dict), ...]
        in input order."""
        chunk = chunk or int(os.environ.get("ONEDC_PIPELINE_CHUNK", "8"))
        rt = self._codec_rt
        caps = list(captions) if captions is not None else [""] * len(images)
        assert len(caps) == len(images)
        buckets: Dict[Tuple[int, int], list] = {}
        for i, im in enumerate(images):
            _, h, w, _ = im.shape
            buckets.setdefault((h, w), []).append(i)
        results: list = [None] * len(images)
        for (h, w), idxs in buckets.items():
            pad = get_padding_size(h, w, self.ds)
            fetched = []
            for c0 in range(0, len(idxs), chunk):
                sel = idxs[c0:c0 + chunk]
                batch = jnp.concatenate(
                    [jnp.asarray(images[i]) for i in sel], axis=0)
                if self.dtype is not None:
                    batch = batch.astype(self.dtype)
                out = self._encode_dev(self.params,
                                       self._pad_replicate(batch, pad))
                for a in jax.tree_util.tree_leaves(out):
                    a.copy_to_host_async()
                fetched.append((sel, out))
            for sel, out in fetched:
                self._write_chunk_streams(rt, out, sel, results, w, h,
                                          [caps[i] for i in sel])
        return results

    def decode_batch(self, streams, mesh=None):
        """Decode N bitstreams, batching same-padded-size streams.

        The four-part prior forces 4 host<->device round trips per decode
        (SURVEY.md section 3.2); batching shares them across images, the
        per-stream rANS decodes run on a thread pool, and with ``mesh``
        the device batch is sharded over the data axis (tiles/images ride
        separate chips). Mixed sizes (e.g. a Kodak folder of portrait +
        landscape images) are bucketed by padded size — one device batch
        per bucket, results returned in input order. Mesh-padding rows
        decode zero symbols (no redundant rANS/stream replay).
        Returns a list of (1,H,W,3) images.
        """
        rt = self._codec_rt
        from ..entropy.framing import decode_i
        decs = [decode_i(s, rt.fsq.index_bits, self.ds) for s in streams]

        buckets: Dict[Tuple[int, int], list] = {}
        for i, d in enumerate(decs):
            buckets.setdefault((d["pad_height"], d["pad_width"]),
                               []).append(i)

        out: list = [None] * len(decs)
        for (ph, pw), idxs in buckets.items():
            preds = self._decode_bucket([decs[i] for i in idxs],
                                        ph, pw, mesh)
            for row, i in enumerate(idxs):
                d = decs[i]
                pl, pr, pt, pb = d["pad_tuple"]
                h, w = ph - pt - pb, pw - pl - pr
                out[i] = preds[row:row + 1, pt:pt + h, pl:pl + w, :].astype(
                    jnp.float32)
        return out

    def _decode_bucket(self, decs, ph: int, pw: int, mesh=None):
        """One same-padded-size device batch -> padded predictions."""
        rt = self._codec_rt
        n = len(decs)
        zh, zw = ph // self.ds, pw // self.ds

        if not self.model.z_only and n > 1:
            return self._decode_bucket_pipelined(decs, zh, zw, mesh=mesh)

        z_indices = np.stack([
            rt.fsq.unpack_indices(d["bit_stream_z"], zh * zw).reshape(zh, zw)
            for d in decs])
        sharding, mult = self._batch_sharding(mesh)
        z_indices = self._pad_batch(z_indices, mult)

        if self.model.z_only:
            # chunked dispatch-ahead: a whole serving bucket in ONE
            # program would blow HBM at 768px (flat B=16 OOMs on VAE
            # activations — ROADMAP); per-device rows stay <= chunk
            chunk = int(os.environ.get("ONEDC_PIPELINE_CHUNK", "8")) * mult
            outs = []
            for c0 in range(0, z_indices.shape[0], chunk):
                zi = jnp.asarray(z_indices[c0:c0 + chunk])
                if sharding is not None and zi.shape[0] % mult == 0:
                    zi = jax.device_put(zi, sharding)
                outs.append(self._decode_z_only(self.params, zi))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        coders = rt.make_stream_coders([d["bit_stream_y"] for d in decs])
        y_hat, z_semantic = rt.run_four_part_decode(
            z_indices, coders, sharding=sharding)
        return self._decode_dev(self.params, y_hat, z_semantic)

    def _decode_bucket_pipelined(self, decs, zh: int, zw: int,
                                 chunk: Optional[int] = None, mesh=None):
        """Software-pipelined decode over a stream of images — the
        schedule lives in ``serving/pipeline.py`` (shared verbatim with
        the AOT artifact serving path); this binds it to the live
        runtime's jitted programs and the mesh data-axis sharding.

        The prior-loop programs are identical to the serial path; the NN
        body runs as two programs instead of one fused one (x0 crosses
        HBM at the same f32->dtype cast as the fused path), so outputs
        match the serial path to float epsilon
        (tests/test_onedc.py::test_decode_batch_matches_sequential).
        """
        from ..serving.pipeline import DecodePrograms, pipelined_decode

        rt = self._codec_rt
        sharding, mult = self._batch_sharding(mesh)
        put = ((lambda a: jax.device_put(a, sharding))
               if sharding is not None else None)
        programs = DecodePrograms(
            begin=lambda zi: rt._begin(rt.params, zi),
            update=[
                (lambda yqr, m, yh, c, _s=s: rt._update[_s](
                    rt.params, yqr, m, yh, c)) for s in range(4)],
            x0=lambda yh, zs: self._decode_x0(self.params, yh, zs),
            vae=lambda x0: self._decode_vae(self.params, x0),
        )
        return pipelined_decode(
            programs, rt.make_stream_coders,
            lambda b: rt.fsq.unpack_indices(b, zh * zw),
            decs, zh, zw, mult=mult, put=put, chunk=chunk)


def ensure_tiny_vae_params(model: OneDC, params, rng=None):
    """Return ``params`` with a ``vae_tiny_dec`` subtree grafted in.

    The TinyVAE decoder's weights are an external artifact (taesd —
    ref model_..._stage1.py:46-49 loads them from_pretrained); a
    checkpoint trained with ``use_large_vae=True`` has no such subtree.
    Pass ported taesd weights as ``rng=None`` is fine once they're in
    the tree; otherwise this initializes a fresh decoder (random init —
    bench/proxy use only). Idempotent; never mutates the input tree."""
    if "vae_tiny_dec" in params["params"]:
        return params
    from ..nn.vae import TinyVaeDecoder
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tv = TinyVaeDecoder(ch=model.tiny_vae_ch)
    vp = tv.init(rng, jnp.zeros((1, 8, 8, model.vae_ch),
                                model.compute_dtype or jnp.float32))
    new = dict(params)
    new["params"] = dict(params["params"])
    new["params"]["vae_tiny_dec"] = vp["params"]
    return new

