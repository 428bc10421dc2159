"""Factorized (non-conditional) prior a.k.a. BitEstimator.

A 4-layer monotone density model per channel (ref ``entropy_models.py:
97-249``). Unused by the shipped OneDC inference paths (z is FSQ-coded),
but part of the component inventory; also used by video-codec style
configs with ``mv_z_channel``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pmf_to_quantized_cdf
from .bound import lower_bound


class Bitparm(nn.Module):
    channels: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.normal(stddev=0.01)
        h = self.param("h", init, (1, 1, 1, self.channels))
        b = self.param("b", init, (1, 1, 1, self.channels))
        x = x * jax.nn.softplus(h) + b
        if self.final:
            return x
        a = self.param("a", init, (1, 1, 1, self.channels))
        return x + jnp.tanh(x) * jnp.tanh(a)


class BitEstimator(nn.Module):
    """CDF model over integers for one latent channel group (NHWC)."""

    channels: int

    @nn.compact
    def __call__(self, x, mode: str = "cdf"):
        logits = Bitparm(self.channels)(x)
        logits = Bitparm(self.channels)(logits)
        logits = Bitparm(self.channels)(logits)
        logits = Bitparm(self.channels, final=True)(logits)
        if mode == "logits":
            return logits
        return jax.nn.sigmoid(logits)

    def prob(self, params, x):
        """Training-time probability of the integer bucket around x."""
        apply = lambda v: self.apply(params, v, mode="logits")
        lower = apply(x - 0.5)
        upper = apply(x + 0.5)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        prob = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return lower_bound(prob, 1e-9)

    def bits(self, params, x, training: bool = True):
        from .gaussian import probs_to_bits

        if training:
            probs = self.prob(params, x)
        else:
            cdf = lambda v: self.apply(params, v)
            probs = cdf(x + 0.5) - cdf(x - 0.5)
        return probs_to_bits(probs)


class FactorizedCoder:
    """Host bridge building quantized CDF tables from a trained BitEstimator."""

    def __init__(self, module: BitEstimator, params):
        self.module = module
        self.params = params
        self.entropy_coder = None
        self.cdf_group_index = None
        self._quantized_cdf = None
        self._cdf_length = None
        self._offset = None

    def _cdf_at(self, v: np.ndarray) -> np.ndarray:
        c = self.module.channels
        x = jnp.asarray(v, jnp.float32).reshape(1, -1, 1, c)
        return np.asarray(self.module.apply(self.params, x))[0, :, 0, :]

    def update(self, force: bool = False, entropy_coder=None):
        assert entropy_coder is not None
        self.entropy_coder = entropy_coder
        if not force and self._offset is not None:
            return
        c = self.module.channels
        minima = np.full(c, 50, np.int64)
        maxima = np.full(c, 50, np.int64)
        for i in range(50, 1, -1):
            probs = self._cdf_at(np.full((1, c), -float(i), np.float32))[0]
            minima = np.where(probs < 1e-4, i, minima)
        for i in range(50, 1, -1):
            probs = self._cdf_at(np.full((1, c), float(i), np.float32))[0]
            maxima = np.where(probs > 0.9999, i, maxima)
        offset = -minima
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())

        samples = np.arange(max_length, dtype=np.float32)[:, None] - minima[None, :].astype(np.float32)
        lower = self._cdf_at(samples - 0.5)
        upper = self._cdf_at(samples + 0.5)
        pmf = (upper - lower).T  # (C, L)
        tail_mass = lower[0, :] + (1.0 - upper[-1, :])

        quantized = np.zeros((c, max_length + 2), dtype=np.int32)
        for i in range(c):
            row = np.concatenate([pmf[i, :pmf_length[i]], [tail_mass[i]]])
            cdf = pmf_to_quantized_cdf(row.astype(np.float32))
            quantized[i, :len(cdf)] = cdf
        self._quantized_cdf = quantized
        self._cdf_length = (pmf_length + 2).astype(np.int32)
        self._offset = offset.astype(np.int32)
        self.cdf_group_index = self.entropy_coder.add_cdf(
            self._quantized_cdf, self._cdf_length, self._offset)

    def build_indexes(self, shape_nhwc) -> np.ndarray:
        n, h, w, c = shape_nhwc
        return np.broadcast_to(
            np.arange(c, dtype=np.int32)[None, None, None, :], (n, h, w, c))

    def encode(self, x: np.ndarray):
        indexes = self.build_indexes(x.shape)
        self.entropy_coder.encode_with_indexes(
            x.reshape(-1), indexes.reshape(-1), self.cdf_group_index)

    def decode_stream(self, spatial_hw) -> np.ndarray:
        shape = (1, spatial_hw[0], spatial_hw[1], self.module.channels)
        indexes = self.build_indexes(shape)
        val = self.entropy_coder.decode_stream(
            indexes.reshape(-1), self.cdf_group_index)
        return val.reshape(shape).astype(np.float32)
