"""Latent codec tests: training forward, compress/decompress parity,
full bitstream round trip through the C++ rANS coder.

Tiny but structurally faithful config (all channels 32-divisible for
GroupNorm, bottleneck divisible by 4 for the four-part prior).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.codec import LatentCodec
from onedc_tpu.models.runtime import CodecRuntime

TINY = dict(
    cond_ch=4,
    ctrl_ch=32,
    internal_ch=64,
    bottleneck_ch=32,
    unet_ch_config=(32, 64, 64),
    z_fsq_levels=(4,) * 7,
)


@pytest.fixture(scope="module")
def codec_setup():
    codec = LatentCodec(**TINY)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 64, 64, 3)) * 0.5
    cond = jax.random.normal(key, (1, 8, 8, 4))
    params = jax.jit(lambda x, c: codec.init(
        {"params": key}, x, c))(x, cond)
    return codec, params, x, cond


def test_forward_shapes_and_bpp(codec_setup):
    codec, params, x, cond = codec_setup
    out = jax.jit(lambda p, x, c: codec.apply(p, x, c))(params, x, cond)
    assert out["x_hat"].shape == (1, 8, 8, 32)       # ctrl at /8
    assert out["y_hat"].shape == (1, 4, 4, 32)       # y at /16
    assert out["y_semantic"].shape == (1, 1, 1, 64)  # sem at /64
    assert out["z_indices"].shape == (1, 1, 1)
    assert float(out["bpp"]) > 0
    assert np.isfinite(float(out["bpp_hard_y"]))


def test_train_forward_has_gradients(codec_setup):
    codec, params, x, cond = codec_setup

    def loss_fn(p):
        out = codec.apply(p, x, cond, training=True,
                          noise_rng=jax.random.PRNGKey(1))
        return jnp.mean(out["x_hat"] ** 2) + 0.01 * out["bpp"]

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    # encoder must receive gradient through STE quantization
    g_enc = jax.tree_util.tree_leaves(grads["params"]["enc"])
    assert any(float(jnp.abs(l).max()) > 0 for l in g_enc)


def test_bitstream_round_trip(codec_setup, tmp_path):
    codec, params, x, cond = codec_setup
    rt = CodecRuntime(codec, params)
    rt.update(force=True)

    fp = tmp_path / "img.bin"
    stream, bpp = rt.encode(x, cond, pic_width=60, pic_height=60, fp=str(fp))
    assert bpp["bpp"] > 0 and bpp["bits_z"] == 16  # 14 bits -> 2 bytes
    assert fp.stat().st_size == len(stream)

    # decode from bytes only (fresh of encoder state)
    x_hat, y_sem, orig_hw, pad_hw, pad = rt.decode(stream=stream)
    assert orig_hw == (60, 60)
    assert pad_hw == (64, 64)
    assert x_hat.shape == (1, 8, 8, 32)

    # decode path must reproduce the compress-side y_hat exactly:
    # compare x_hat against the eval-mode forward (same quantized math)
    out = jax.jit(lambda p, x, c: codec.apply(p, x, c))(params, x, cond)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(out["x_hat"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_sem),
                               np.asarray(out["y_semantic"]),
                               rtol=1e-5, atol=1e-5)


def test_decode_from_file(codec_setup, tmp_path):
    codec, params, x, cond = codec_setup
    rt = CodecRuntime(codec, params)
    rt.update()
    fp = tmp_path / "img.bin"
    rt.encode(x, cond, pic_width=64, pic_height=64, fp=str(fp))
    x_hat, _, orig_hw, _, _ = rt.decode(fp=str(fp))
    assert orig_hw == (64, 64)
    assert np.all(np.isfinite(np.asarray(x_hat)))


def test_z_only_variant():
    codec = LatentCodec(**{**TINY, "z_only": True})
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 64, 64, 3))
    cond = jax.random.normal(key, (1, 8, 8, 4))
    params = jax.jit(lambda x, c: codec.init({"params": key}, x, c))(x, cond)
    out = jax.jit(lambda p, x, c: codec.apply(p, x, c))(params, x, cond)
    assert out["x_hat"].shape == (1, 8, 8, 32)

    rt = CodecRuntime(codec, params)
    stream, bpp = rt.encode_z_only(out["z_indices"], 64, 64)
    x_hat, y_sem, orig_hw, _, _ = rt.decode(stream=stream)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(out["x_hat"]),
                               rtol=1e-5, atol=1e-5)
