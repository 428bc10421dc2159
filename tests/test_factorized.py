"""Factorized prior (BitEstimator) + coder round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from onedc_tpu.entropy.coder import EntropyCoder
from onedc_tpu.entropy.factorized import BitEstimator, FactorizedCoder


def _init(channels=4):
    be = BitEstimator(channels)
    x = jnp.zeros((1, 2, 2, channels))
    params = jax.jit(lambda x: be.init(jax.random.PRNGKey(0), x))(x)
    return be, params


def test_cdf_monotone_and_bounded(rng):
    be, params = _init()
    xs = jnp.asarray(np.linspace(-30, 30, 61).astype(np.float32))
    grid = jnp.tile(xs.reshape(1, -1, 1, 1), (1, 1, 1, be.channels))
    cdf = np.asarray(jax.jit(lambda p, x: be.apply(p, x))(params, grid))[0, :, 0]
    assert (cdf >= 0).all() and (cdf <= 1).all()
    assert (np.diff(cdf, axis=0) >= -1e-6).all()  # monotone per channel


def test_bits_finite_and_positive(rng):
    be, params = _init()
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32) * 3)
    bits_t = be.bits(params, jnp.round(x), training=True)
    bits_e = be.bits(params, jnp.round(x), training=False)
    assert np.isfinite(np.asarray(bits_t)).all()
    assert (np.asarray(bits_t) >= 0).all()
    assert np.isfinite(np.asarray(bits_e)).all()


def test_factorized_coder_round_trip(rng):
    be, params = _init()
    coder = FactorizedCoder(be, params)
    ec = EntropyCoder()
    coder.update(force=True, entropy_coder=ec)

    z = np.round(rng.normal(0, 2.0, (1, 6, 6, 4))).astype(np.int32)
    ec.reset()
    coder.encode(z)
    ec.flush()
    stream = ec.get_encoded_stream()  # EntropyCoder facade returns bytes
    assert len(stream) > 0

    ec.set_stream(stream)
    out = coder.decode_stream((6, 6))
    np.testing.assert_array_equal(out.astype(np.int32), z)
