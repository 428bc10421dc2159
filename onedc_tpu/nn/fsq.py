"""Finite Scalar Quantization (FSQ), NHWC.

Re-implementation of the FSQ scheme used for the OneDC hyperprior
(``codec_module.py:202-203``; external ``vector_quantize_pytorch.FSQ`` with
levels [4]*7 -> codebook 4^7 = 16384 -> 14-bit indices). Semantics match
the lucidrains implementation for this configuration:

- bound: z |-> tanh(z + shift) * half_l - offset with eps=1e-3
- quantize: round(bound(z)) / half_width  (straight-through gradient)
- index packing: least-significant digit first (basis cumprod of levels)

Quantization is always computed in float32 regardless of input dtype (the
reference's force_quantization_f32), then cast back.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FSQ:
    def __init__(self, levels: Sequence[int]):
        self.levels = tuple(int(l) for l in levels)
        self._levels = np.asarray(self.levels, dtype=np.int32)
        self._basis = np.concatenate(
            [[1], np.cumprod(self._levels[:-1])]).astype(np.int32)
        self.codebook_size = int(np.prod(self._levels))
        self.dim = len(self.levels)
        self.index_bits = int(round(np.log2(self.codebook_size)))

    # -- core maps ---------------------------------------------------------

    def bound(self, z, eps: float = 1e-3):
        levels = jnp.asarray(self._levels, jnp.float32)
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        """z (..., dim) float -> codes in [-1, 1], straight-through round."""
        orig_dtype = z.dtype
        z32 = z.astype(jnp.float32)
        bounded = self.bound(z32)
        quantized = bounded + jax.lax.stop_gradient(
            jnp.round(bounded) - bounded)
        half_width = jnp.asarray(self._levels // 2, jnp.float32)
        return (quantized / half_width).astype(orig_dtype)

    def codes_to_indices(self, codes):
        half_width = jnp.asarray(self._levels // 2, jnp.float32)
        digits = codes.astype(jnp.float32) * half_width + half_width
        basis = jnp.asarray(self._basis, jnp.float32)
        return jnp.sum(digits * basis, axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        basis = jnp.asarray(self._basis, jnp.int32)
        levels = jnp.asarray(self._levels, jnp.int32)
        digits = (indices[..., None] // basis) % levels
        half_width = jnp.asarray(self._levels // 2, jnp.float32)
        return (digits.astype(jnp.float32) - half_width) / half_width

    # -- NHWC convenience ---------------------------------------------------

    def __call__(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """z (B, H, W, dim) -> (codes same shape, indices (B, H, W))."""
        codes = self.quantize(z)
        indices = self.codes_to_indices(jax.lax.stop_gradient(codes))
        return codes, indices

    # -- host-side index <-> bytes packing ----------------------------------

    def pack_indices(self, indices: np.ndarray) -> bytes:
        """Pack indices into big-endian bit-contiguous bytes.

        Byte-compatible with the reference's Python bigint packing
        (codec_module.py:404-409).
        """
        flat = np.asarray(indices).reshape(-1)
        nbits = self.index_bits
        bit_str_len = len(flat) * nbits
        num_bytes = (bit_str_len + 7) // 8
        value = 0
        for v in flat.tolist():
            value = (value << nbits) | int(v)
        # int(bit_str, 2).to_bytes(ceil(bits/8)) keeps the payload in the LOW
        # bits; any byte-alignment padding lands in the high-order bits.
        return value.to_bytes(num_bytes, "big")

    def unpack_indices(self, data: bytes, count: int) -> np.ndarray:
        nbits = self.index_bits
        value = int.from_bytes(data, "big")
        out = np.empty(count, dtype=np.int32)
        mask = (1 << nbits) - 1
        for i in range(count - 1, -1, -1):
            out[i] = value & mask
            value >>= nbits
        return out
