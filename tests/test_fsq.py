"""FSQ quantizer tests: code/index round trips and byte packing."""

import jax.numpy as jnp
import numpy as np

from onedc_tpu.nn.fsq import FSQ


def test_codebook_size():
    fsq = FSQ([4] * 7)
    assert fsq.codebook_size == 4 ** 7 == 16384
    assert fsq.index_bits == 14


def test_quantize_levels():
    fsq = FSQ([4] * 7)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 3, 7)) * 4,
                    jnp.float32)
    codes, indices = fsq(z)
    vals = np.unique(np.asarray(codes))
    # levels=4 -> codes in {-1, -0.5, 0, 0.5}
    assert set(np.round(vals * 2).astype(int)).issubset({-2, -1, 0, 1})
    assert indices.shape == (2, 3, 3)
    assert indices.min() >= 0 and indices.max() < 16384


def test_indices_roundtrip():
    fsq = FSQ([4] * 7)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(1, 4, 5, 7)).astype(np.float32) * 3)
    codes, indices = fsq(z)
    recon = fsq.indices_to_codes(indices)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(codes), atol=1e-6)


def test_index_all_values_roundtrip():
    fsq = FSQ([4, 4, 4])
    idx = jnp.arange(64, dtype=jnp.int32)
    codes = fsq.indices_to_codes(idx)
    back = fsq.codes_to_indices(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_pack_unpack_matches_reference_bigint():
    """Byte layout parity with the reference bigint packing
    (codec_module.py:404-409 / 426-431)."""
    fsq = FSQ([4] * 7)
    rng = np.random.default_rng(2)
    indices = rng.integers(0, 16384, size=37).astype(np.int64)

    # reference-style packing
    unit = 14
    index_str = "".join(bin(int(v))[2:].zfill(unit) for v in indices)
    num_bytes = (len(index_str) + 7) // 8
    ref_bytes = int(index_str, 2).to_bytes(num_bytes, "big")

    ours = fsq.pack_indices(indices)
    assert ours == ref_bytes

    out = fsq.unpack_indices(ours, len(indices))
    np.testing.assert_array_equal(out, indices)


def test_quantize_is_idempotent():
    fsq = FSQ([4] * 7)
    z = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 2, 7)),
                    jnp.float32)
    codes, idx = fsq(z)
    codes2, idx2 = fsq(codes * 2.0)  # scaled codes quantize to themselves?
    # not necessarily equal; but quantizing codes-of-codes via indices is stable
    recon = fsq.indices_to_codes(idx)
    _, idx3 = fsq(jnp.arctanh(jnp.clip(recon, -0.99, 0.99)))
    np.testing.assert_array_equal(np.asarray(idx3), np.asarray(idx))
