"""Conditional Gaussian entropy model.

Device side (JAX): probability/bit estimation and scale->CDF-index mapping,
all jittable. Host side (numpy): CDF table construction for the rANS coder
and the encode/decode bridge.

Semantics follow the reference ``GaussianEncoder``
(``src/modules/entropy/entropy_models.py:252-374``): 256 log-spaced scales
in [0.11, 64], per-scale PMF support search out to +/-50, erfc-based
training probability, and negative index = skip (force-zero).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special as sp_special

from ..ops import pmf_to_quantized_cdf
from .bound import lower_bound

SCALE_MIN = 0.11
SCALE_MAX = 64.0
SCALE_LEVELS = 256
LOG_SCALE_MIN = math.log(SCALE_MIN)
LOG_SCALE_MAX = math.log(SCALE_MAX)
LOG_SCALE_STEP = (LOG_SCALE_MAX - LOG_SCALE_MIN) / (SCALE_LEVELS - 1)

# per-distribution scale-table config (ref entropy_models.py:256-267):
# laplace uses scale_min 0.01 with the same 256-level log spacing
DIST_SCALE_MIN = {"gaussian": SCALE_MIN, "laplace": 0.01}


def _log_scale_bounds(distribution: str):
    """Single source for the per-distribution log-scale range."""
    return math.log(DIST_SCALE_MIN[distribution]), math.log(SCALE_MAX)


def _log_scale_params(distribution: str):
    lo, hi = _log_scale_bounds(distribution)
    return lo, (hi - lo) / (SCALE_LEVELS - 1)


def scale_table(dtype=np.float32, distribution: str = "gaussian") -> np.ndarray:
    # np.linspace (not lo + step*arange): matches the reference's
    # torch.linspace endpoint snapping bit-for-bit (entropy_models.py:256)
    lo, hi = _log_scale_bounds(distribution)
    return np.exp(np.linspace(lo, hi, SCALE_LEVELS)).astype(dtype)


# ---------------------------------------------------------------------------
# Device-side (jittable)
# ---------------------------------------------------------------------------

def gaussian_prob(values, scales):
    """P(round(v) | N(0, scale)) via the complementary error function.

    Training-time estimator; mirrors ``get_gaussian_prob``
    (entropy_models.py:277-295) including the |v| symmetry trick.
    """
    const = -(2 ** -0.5)
    scales = lower_bound(scales, 0.11)
    values = jnp.abs(values)
    upper = jax.scipy.special.erfc(const * ((0.5 - values) / scales))
    lower = jax.scipy.special.erfc(const * ((-0.5 - values) / scales))
    return lower_bound(0.5 * (upper - lower), 1e-9)


def laplace_prob(values, scales):
    scales = lower_bound(scales, 0.01)

    def _cdf2(inputs):
        return jnp.sign(inputs) * (1.0 - jnp.exp(-jnp.abs(inputs)))

    upper = _cdf2((values + 0.5) / scales)
    lower = _cdf2((values - 0.5) / scales)
    return lower_bound(0.5 * (upper - lower), 1e-9)


def probs_to_bits(probs):
    bits = -jnp.log(probs + 1e-5) / math.log(2.0)
    return lower_bound(bits, 0.0)


def gaussian_bits(y, sigma, training: bool = True):
    """Bits to code y under N(0, sigma); eval path uses the exact CDF diff."""
    if training:
        probs = gaussian_prob(y, sigma)
    else:
        sigma = jnp.clip(sigma, 1e-5, 1e10)
        const = 1.0 / (sigma * np.sqrt(2.0))
        upper = 0.5 * (1.0 + jax.scipy.special.erf((y + 0.5) * const))
        lower = 0.5 * (1.0 + jax.scipy.special.erf((y - 0.5) * const))
        probs = upper - lower
    return probs_to_bits(probs)


def build_indexes(scales, skip_thres=None, distribution: str = "gaussian"):
    """Map sigma -> scale-table index; < skip_thres -> -1 (skip symbol).

    Always computes in f32 (bf16 pipelines feed bf16 scales; the integer
    index must not depend on the pipeline dtype). Jittable — running this
    ON DEVICE lets the four-part decode ship int16 indexes to the host
    instead of f32 scales (half the bytes per round trip).
    """
    log_min, log_step = _log_scale_params(distribution)
    scales = scales.astype(jnp.float32)
    safe = jnp.maximum(scales, 1e-5)
    idx = (jnp.log(safe) - log_min) / log_step
    idx = jnp.clip(idx, 0, SCALE_LEVELS - 1).astype(jnp.int32)
    if skip_thres is not None:
        idx = jnp.where(scales < skip_thres, -1, idx)
    return idx


# ---------------------------------------------------------------------------
# Host-side: CDF tables + coder bridge
# ---------------------------------------------------------------------------

def _normal_cdf(x: np.ndarray, sigma: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + sp_special.erf(x / (sigma * np.sqrt(2.0))))


def _laplace_cdf(x: np.ndarray, scale: np.ndarray) -> np.ndarray:
    # CDF of Laplace(0, scale): 0.5 + 0.5*sign(x)*(1 - exp(-|x|/scale))
    return 0.5 + 0.5 * np.sign(x) * (1.0 - np.exp(-np.abs(x) / scale))


_DIST_CDF = {"gaussian": _normal_cdf, "laplace": _laplace_cdf}


def build_cdf_table(precision: int = 16, allow_vendored: bool = True,
                    distribution: str = "gaussian"):
    """Quantized CDF bank for the 256-entry scale table.

    Mirrors ``GaussianEncoder.update`` (entropy_models.py:313-353): per-scale
    support half-width = smallest i in [2, 50] with CDF(i) > 0.9999; PMF over
    [-c, c] plus a tail bucket of 2*CDF(-c-0.5). ``distribution`` selects the
    gaussian (scale_min 0.11) or laplace (scale_min 0.01) family — both are
    reference capabilities (entropy_models.py:253-267); OneDC ships gaussian.

    Bitstream interop with the reference requires BIT-IDENTICAL tables on
    both sides, and the reference computes PMFs with torch float32
    erf/exp — which differs from a float64 computation by 1 ulp on a few
    percent of the scale rows (enough to shift a dozen quantized CDF
    entries by 1). The default therefore loads a vendored table captured
    from the reference's own ``GaussianEncoder.update``
    (data/{gaussian,laplace}_cdf16.npz; see tests/test_reference_parity.py
    which re-derives and checks both). The numpy computation below is the
    executable spec / fallback.

    Returns (quantized_cdf int32 [256, max_len+2], cdf_length int32, offset
    int32).
    """
    if allow_vendored and precision == 16:
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", f"{distribution}_cdf16.npz")
        if os.path.exists(path):
            d = np.load(path)
            return (d["quantized_cdf"].astype(np.int32),
                    d["cdf_length"].astype(np.int32),
                    d["offset"].astype(np.int32))
    cdf_fn = _DIST_CDF[distribution]
    scales = scale_table(np.float64, distribution)
    centers = np.full(SCALE_LEVELS, 50, dtype=np.int64)
    for i in range(50, 1, -1):
        probs = cdf_fn(np.float64(i), scales)
        centers = np.where(probs > 0.9999, i, centers)
    pmf_length = 2 * centers + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float64)[None, :] - centers[:, None]
    sig = scales[:, None]
    upper = cdf_fn(samples + 0.5, sig)
    lower = cdf_fn(samples - 0.5, sig)
    pmf = (upper - lower).astype(np.float32)
    tail_mass = (2.0 * lower[:, :1]).astype(np.float32)

    quantized = np.zeros((SCALE_LEVELS, max_length + 2), dtype=np.int32)
    for i in range(SCALE_LEVELS):
        row_pmf = np.concatenate([pmf[i, :pmf_length[i]], tail_mass[i]])
        cdf = pmf_to_quantized_cdf(row_pmf, precision)
        quantized[i, :len(cdf)] = cdf
    return quantized, (pmf_length + 2).astype(np.int32), (-centers).astype(np.int32)


def build_gaussian_cdf_table(precision: int = 16, allow_vendored: bool = True):
    return build_cdf_table(precision, allow_vendored, "gaussian")


class GaussianConditionalCoder:
    """Host bridge: registers CDFs with an EntropyCoder, encodes/decodes.

    ``distribution`` selects the gaussian or laplace scale family, like the
    reference ``GaussianEncoder(distribution=...)`` (entropy_models.py:253).
    """

    def __init__(self, distribution: str = "gaussian"):
        assert distribution in DIST_SCALE_MIN, distribution
        self.distribution = distribution
        self._log_min, self._log_step = _log_scale_params(distribution)
        self.entropy_coder = None
        self.cdf_group_index = None
        self._quantized_cdf = None
        self._cdf_length = None
        self._offset = None

    def update(self, force: bool = False, entropy_coder=None):
        assert entropy_coder is not None
        self.entropy_coder = entropy_coder
        if not force and self._offset is not None:
            return
        self._quantized_cdf, self._cdf_length, self._offset = (
            build_cdf_table(distribution=self.distribution))
        self.cdf_group_index = self.entropy_coder.add_cdf(
            self._quantized_cdf, self._cdf_length, self._offset)

    def get_cdf_info(self):
        return self._quantized_cdf, self._cdf_length, self._offset

    def set_cdf_info(self, quantized_cdf, cdf_length, offset):
        self._quantized_cdf = np.asarray(quantized_cdf, np.int32)
        self._cdf_length = np.asarray(cdf_length, np.int32).reshape(-1)
        self._offset = np.asarray(offset, np.int32).reshape(-1)

    def _indexes_np(self, scales: np.ndarray, skip_thres=None) -> np.ndarray:
        # f32 like the device build_indexes / the reference's torch path:
        # the integer index must not depend on the host float width
        scales = np.asarray(scales, np.float32)
        safe = np.maximum(scales, np.float32(1e-5))
        idx = (np.log(safe) - np.float32(self._log_min)) \
            / np.float32(self._log_step)
        idx = np.clip(idx, 0, SCALE_LEVELS - 1).astype(np.int32)
        if skip_thres is not None:
            idx = np.where(scales < skip_thres, -1, idx)
        return idx

    def encode(self, symbols: np.ndarray, scales: np.ndarray, skip_thres=None):
        indexes = self._indexes_np(np.asarray(scales), skip_thres)
        self.entropy_coder.encode_with_indexes(
            np.asarray(symbols), indexes, self.cdf_group_index)

    def decode_stream(self, scales: np.ndarray, skip_thres=None) -> np.ndarray:
        scales = np.asarray(scales)
        indexes = self._indexes_np(scales, skip_thres)
        vals = self.entropy_coder.decode_stream(indexes, self.cdf_group_index)
        return vals.reshape(scales.shape).astype(np.float32)

    # device-computed index variants (see build_indexes): the device ships
    # int16 indexes instead of f32 scales — half the host transfer on THE
    # serial four-part loop, and index math independent of pipeline dtype

    def encode_with_indexes(self, symbols: np.ndarray, indexes: np.ndarray):
        self.entropy_coder.encode_with_indexes(
            np.asarray(symbols), np.asarray(indexes), self.cdf_group_index)

    def decode_stream_with_indexes(self, indexes: np.ndarray) -> np.ndarray:
        """Symbols stay int16 (the native coder's output dtype): the only
        consumers upload them straight to a device program that casts to
        its compute dtype, so shipping int16 instead of f32 halves the
        hot host->device upload of the serial four-part loop."""
        indexes = np.asarray(indexes)
        vals = self.entropy_coder.decode_stream(indexes,
                                                self.cdf_group_index)
        return vals.reshape(indexes.shape)

    @staticmethod
    def decode_streams_with_indexes(coders, indexes: np.ndarray) -> np.ndarray:
        """Batched twin of ``decode_stream_with_indexes`` over several
        coders' streams (one per batch row of ``indexes``), decoded in
        ONE native call (EntropyCoder.decode_streams). int16, as above."""
        from .coder import EntropyCoder

        indexes = np.asarray(indexes)
        assert indexes.shape[0] == len(coders) and len(coders) > 0
        gi = coders[0].cdf_group_index
        assert all(c.cdf_group_index == gi for c in coders)
        vals = EntropyCoder.decode_streams(
            [c.entropy_coder for c in coders], indexes, gi)
        return vals.reshape(indexes.shape)
