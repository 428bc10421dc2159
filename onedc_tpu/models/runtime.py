"""Host-side codec runtime: bitstream encode/decode orchestration.

Equivalent of the reference's ``IntraNoAR.encode/decode`` driver logic
(``codec_module.py:316-454``) with the TPU split: all NN work happens in a
handful of jitted device programs (compiled once per padded shape), and the
host only runs the rANS coder and byte framing.

Decode interleaving: the four-part prior forces 4 host<->device round trips
(rANS decode of step i feeds the prior net of step i+1). Each device step is
a single fused XLA program; cross-image batching amortizes the latency (see
SURVEY.md section 7.6).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.coder import EntropyCoder
from ..entropy.framing import (
    decode_i,
    encode_i,
    filesize,
    read_from_file,
    write_to_file,
)
from ..entropy.gaussian import GaussianConditionalCoder
from .codec import LatentCodec


class CodecRuntime:
    """Owns (module, params) plus the entropy-coder host state."""

    def __init__(self, codec: LatentCodec, params):
        self.codec = codec
        self.params = params
        self.entropy_coder: Optional[EntropyCoder] = None
        self.gaussian_coder = GaussianConditionalCoder()
        # FSQ helpers live on the module definition (stateless)
        from ..nn.fsq import FSQ
        self.fsq = FSQ(codec.z_fsq_levels)
        self.ds = codec.ds

        self._compress = jax.jit(
            lambda p, x, cond: codec.apply(p, x, cond, method=codec.compress))
        self._begin = jax.jit(
            lambda p, zi: codec.apply(p, zi, method=codec.decompress_begin))
        self._update = {
            step: jax.jit(partial(
                lambda p, yqr, means, yhat, common, *, s: codec.apply(
                    p, s, yqr, means, yhat, common,
                    method=codec.decompress_update), s=step))
            for step in range(4)
        }
        self._finish = jax.jit(
            lambda p, yh, zs: codec.apply(p, yh, zs,
                                          method=codec.decompress_finish))
        self._z_only_decode = jax.jit(
            lambda p, zi: codec.apply(p, zi, method=codec.decompress_z_only))

    # -- CDF table lifecycle (ref compression_model.py:169-175) -------------

    def update(self, force: bool = False):
        if self.entropy_coder is not None and not force:
            return
        self.entropy_coder = EntropyCoder()
        self.gaussian_coder.update(force=True, entropy_coder=self.entropy_coder)

    # -- encode -------------------------------------------------------------

    def encode(self, x, cond, pic_width: int, pic_height: int,
               fp=None, caption: str = "") -> Tuple[bytes, Dict[str, float]]:
        """x: (1,H,W,3) padded to x64, cond: (1,H/8,W/8,4). Returns
        (container bytes, bpp dict) — ref codec_module.py:316-353."""
        out = self._compress(self.params, x, cond)
        return self.write_streams(out, pic_width, pic_height, fp,
                                  caption=caption)

    def write_streams(self, out: Dict[str, Any], pic_width: int,
                      pic_height: int, fp=None,
                      caption: str = "") -> Tuple[bytes, Dict[str, float]]:
        """Host half of encode: rANS-code the write plan + frame the
        container. ``caption`` rides the bitstream per the reference spec
        (entropy/utils.py:95-105; used by stage-2 guidance). The bridge
        itself is shared with the model-code-free ServingEncoder
        (serving/encoder.py:write_container) so the two cannot drift."""
        from ..serving.encoder import write_container

        assert self.entropy_coder is not None, "call update() first"
        return write_container(self.entropy_coder, self.gaussian_coder,
                               self.fsq, out, pic_width, pic_height,
                               fp=fp, caption=caption)

    def encode_z_only(self, z_indices, pic_width: int, pic_height: int,
                      fp=None, caption: str = ""
                      ) -> Tuple[bytes, Dict[str, float]]:
        """z-only variant: container with an empty y stream (the reference's
        exlow model has no bitstream writer at all — this adds one, 14 bits
        per 64x64 block; ref z_only/inference.py:106-117 bpp accounting).
        ``caption`` rides the container exactly as in the lambda path."""
        bit_stream_z = self.fsq.pack_indices(np.asarray(z_indices))
        caption_bytes = caption.encode("utf-8") if caption else b""
        total = encode_i(pic_height=pic_height, pic_width=pic_width,
                         bit_stream_y=b"", bit_stream_z=bit_stream_z,
                         bit_stream_caption=caption_bytes,
                         caption_length=len(caption_bytes))
        if fp:
            write_to_file(total, fp)
            file_size = filesize(fp)
        else:
            file_size = 0.0
        pixel_num = pic_height * pic_width
        bits_z = len(bit_stream_z) * 8
        bits_caption = len(caption_bytes) * 8
        return total, {
            "bits_y": 0, "bits_z": bits_z, "bits_caption": bits_caption,
            "bits_total": len(total) * 8,
            "bpp_y": 0.0, "bpp_z": bits_z / pixel_num,
            "bpp_caption": bits_caption / pixel_num,
            "bpp": len(total) * 8 / pixel_num,
            "bpp_file": file_size * 8 / pixel_num,
        }

    # -- decode -------------------------------------------------------------

    def make_stream_coders(self, y_streams):
        """One GaussianConditionalCoder per y-bitstream, sharing this
        runtime's CDF tables (for batched decode)."""
        assert self.entropy_coder is not None, "call update() first"
        cdf_info = self.gaussian_coder.get_cdf_info()
        coders = []
        for ys in y_streams:
            ec = EntropyCoder()
            gc = GaussianConditionalCoder()
            gc.set_cdf_info(*cdf_info)
            gc.entropy_coder = ec
            gc.cdf_group_index = ec.add_cdf(*cdf_info)
            ec.set_stream(ys)
            coders.append(gc)
        return coders

    def run_four_part_decode(self, z_indices, coders, sharding=None):
        """THE four-step host loop, shared by every decode flavor: rANS
        decode of part i feeds the prior net of part i+1 (ref
        compression_model.py:369-407). ``coders``: one per REAL batch
        item; rows past ``len(coders)`` are mesh-padding rows and get
        zero-filled symbols (their outputs are dropped by the caller) —
        no redundant rANS work. Multi-stream steps decode all streams in
        ONE interleaved native call (ops.rans.decode_streams_multi).
        ``sharding``: optional NamedSharding to place device arrays
        (batch over the mesh data axis).

        Returns (y_hat, z_semantic).
        """
        from ..serving.pipeline import _narrow_symbols

        n = len(coders)
        n_rows = z_indices.shape[0]
        assert n_rows >= n, (z_indices.shape, n)

        def put(a):
            return jax.device_put(a, sharding) if sharding is not None else a

        st = self._begin(self.params, put(jnp.asarray(z_indices)))
        y_hat, means, common = st["y_hat"], st["means"], st["common"]
        indexes_r = st["indexes_r"]

        if n == 1 and n_rows == 1:
            for step in range(4):
                y_q_r = _narrow_symbols(
                    coders[0].decode_stream_with_indexes(
                        np.asarray(indexes_r)))
                nxt = self._update[step](self.params, jnp.asarray(y_q_r),
                                         means, y_hat, common)
                y_hat, means = nxt["y_hat"], nxt["means"]
                indexes_r = nxt["indexes_r"]
        else:
            for step in range(4):
                idx = np.asarray(indexes_r)
                parts = type(coders[0]).decode_streams_with_indexes(
                    coders, idx[:n].reshape(n, -1)).reshape(idx[:n].shape)
                if n_rows > n:  # zero-fill mesh-padding rows
                    parts = np.concatenate(
                        [parts, np.zeros_like(idx[n:], dtype=parts.dtype)],
                        axis=0)
                y_q_r = put(jnp.asarray(_narrow_symbols(parts)))
                nxt = self._update[step](self.params, y_q_r, means,
                                         y_hat, common)
                y_hat, means = nxt["y_hat"], nxt["means"]
                indexes_r = nxt["indexes_r"]
        return y_hat, st["z_semantic"]

    def decode(self, fp=None, stream: Optional[bytes] = None):
        """Returns (x_hat control tensor, y_semantic, orig_HW, pad_HW,
        pad_tuple) — ref codec_module.py:356-369."""
        assert fp or stream
        data = stream if stream is not None else read_from_file(fp)
        index_bits = self.fsq.index_bits
        dec = decode_i(data, index_bits, self.ds)

        zh, zw = dec["pad_height"] // self.ds, dec["pad_width"] // self.ds
        z_indices = self.fsq.unpack_indices(
            dec["bit_stream_z"], zh * zw).reshape(1, zh, zw)
        z_indices = jnp.asarray(z_indices)

        if self.codec.z_only:
            x_hat, y_semantic = self._z_only_decode(self.params, z_indices)
        else:
            assert self.entropy_coder is not None, "call update() first"
            self.entropy_coder.set_stream(dec["bit_stream_y"])
            y_hat, z_semantic = self.run_four_part_decode(
                z_indices, [self.gaussian_coder])
            x_hat, y_semantic = self._finish(self.params, y_hat, z_semantic)

        orig_hw = (dec["height"], dec["width"])
        pad_hw = (dec["pad_height"], dec["pad_width"])
        return x_hat, y_semantic, orig_hw, pad_hw, dec["pad_tuple"]
