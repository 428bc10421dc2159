"""Tiled high-res codec path: plan, container, stitched round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.onedc import OneDC, OneDCRuntime
from onedc_tpu.parallel.tiled import TiledCodec, plan_tiles

TINY = dict(
    internal_ch=64, bottleneck_ch=32, unet_ch_config=(32, 64, 64),
    ctrl_ch=32, sd_block_channels=(32, 32, 64, 64), context_dim=64,
    vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4,
)


def test_plan_tiles_covers():
    corners = plan_tiles(200, 140, 64, overlap=0)
    cov = np.zeros((200, 140), bool)
    for y, x in corners:
        cov[y:y + 64, x:x + 64] = True
    assert cov.all()
    # with overlap
    corners = plan_tiles(128, 128, 64, overlap=32)
    assert (0, 0) in corners and (64, 64) in corners


@pytest.fixture(scope="module")
def tiled_setup():
    model = OneDC(**TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 128, 128, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        img[:, :64, :64])
    rt = OneDCRuntime(model, params)
    rt.update(force=True)
    return model, rt, img


def test_tiled_round_trip(tiled_setup, tmp_path):
    _, rt, img = tiled_setup
    tc = TiledCodec(rt, tile=64, overlap=0)
    fp = tmp_path / "big.bin"
    stream, info = tc.encode(img, fp=str(fp))
    assert info["n_tiles"] == 4
    out = tc.decode(stream=stream)
    assert out.shape == img.shape
    assert np.all(np.isfinite(np.asarray(out)))
    out2 = tc.decode(fp=str(fp))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # tile content must match the single-tile codec path exactly
    single = rt.decode(stream=rt.encode(img[:, :64, :64])[0])
    np.testing.assert_allclose(np.asarray(out[:, :64, :64]),
                               np.asarray(single), rtol=1e-5, atol=1e-5)


def test_tiled_overlap_blend(tiled_setup):
    _, rt, img = tiled_setup
    tc = TiledCodec(rt, tile=64, overlap=32)
    img96 = img[:, :96, :96, :]
    stream, info = tc.encode(img96)
    assert info["n_tiles"] == 4
    out = tc.decode(stream=stream)
    assert out.shape == (1, 96, 96, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_small_image_passthrough(tiled_setup):
    _, rt, img = tiled_setup
    tc = TiledCodec(rt, tile=256, overlap=0)
    small = img[:, :64, :64]
    stream, info = tc.encode(small)
    out = tc.decode(stream=stream)
    direct = rt.decode(stream=rt.encode(small)[0])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(direct))
