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

    # the batched tile ENCODE must write byte-identical streams to the
    # serial single-tile path (no symbol drift from batching)
    import struct
    from onedc_tpu.parallel.tiled import MAGIC
    s_single, _ = rt.encode(img[:, :64, :64])
    off = len(MAGIC) + struct.calcsize(">HHHII")
    lens = struct.unpack_from(">4I", stream, off)
    tile0 = stream[off + 16:off + 16 + lens[0]]
    assert tile0 == bytes(s_single)

    # batched decode NN numerics may differ from serial at float epsilon
    # scale only (measured 6e-5 max on the CPU mesh)
    single = rt.decode(stream=s_single)
    np.testing.assert_allclose(np.asarray(out[:, :64, :64]),
                               np.asarray(single), atol=5e-4)
    # batch-1 decode is bit-identical to the serial path
    b1 = rt.decode_batch([bytes(s_single)])[0]
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(single))


def test_tiled_sharded_over_mesh(tiled_setup):
    """BASELINE config 4: the tile batch is actually sharded over the
    mesh data axis, and the stitched output matches the unsharded path."""
    from onedc_tpu.parallel.mesh import make_mesh

    _, rt, img = tiled_setup
    mesh = make_mesh(jax.devices("cpu")[:4])
    tc_serial = TiledCodec(rt, tile=64, overlap=0)
    tc_mesh = TiledCodec(rt, tile=64, overlap=0, mesh=mesh)

    stream, info = tc_mesh.encode(img)
    assert info["n_tiles"] == 4

    # sharding assertion: the device batch inside decode_batch is split
    # over the data axis (4 tiles on 4 devices)
    sharding, mult = rt._batch_sharding(mesh)
    assert mult == 4
    zi = jax.device_put(jnp.zeros((4, 1, 1), jnp.int32), sharding)
    assert len({s.device for s in zi.addressable_shards}) == 4
    assert zi.addressable_shards[0].data.shape == (1, 1, 1)

    # decode the SAME bitstream through both paths: mesh-sharded vs
    # serial. (Comparing two *encodes* is not meaningful at f32: the
    # sharded encode program may differ from the serial one by one ulp,
    # which can flip a quantization symbol — both streams are valid
    # encodings, but they are different bits.)
    out_mesh = tc_mesh.decode(stream=stream)
    out_serial = tc_serial.decode(stream=stream)
    np.testing.assert_allclose(np.asarray(out_mesh),
                               np.asarray(out_serial), atol=5e-4)

    # and the mesh-encoded stream is a faithful encoding: recon close to
    # the serial-encode recon of the same image
    out_ref = tc_serial.decode(stream=tc_serial.encode(img)[0])
    err_mesh = float(jnp.abs(out_mesh - img).mean())
    err_ref = float(jnp.abs(jnp.asarray(out_ref) - img).mean())
    assert abs(err_mesh - err_ref) < 0.02, (err_mesh, err_ref)


def test_decode_batch_mesh_padding_rows(tiled_setup):
    """3 streams on a 4-way mesh: the padding row decodes ZERO symbols
    (no redundant rANS/stream replay) and real rows still match the
    serial path (VERDICT round-2 item 8)."""
    from onedc_tpu.parallel.mesh import make_mesh

    _, rt, img = tiled_setup
    mesh = make_mesh(jax.devices("cpu")[:4])
    imgs = [img[:, :64, :64], img[:, :64, 64:128], img[:, 64:128, :64]]
    streams = [rt.encode(im)[0] for im in imgs]
    outs = rt.decode_batch(streams, mesh=mesh)
    assert len(outs) == 3
    for s, o in zip(streams, outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(rt.decode(stream=s)),
                                   atol=5e-4)


def test_decode_batch_mesh_pipelined_chunks(tiled_setup, monkeypatch):
    """Scale-out serving: the software-PIPELINED decode path sharded over
    the mesh data axis, multiple chunks in flight (chunk=2 on a 2-device
    mesh, 5 streams -> chunks of 2/2/1 with the last padded to a
    shardable batch). Outputs must match the serial path."""
    from onedc_tpu.parallel.mesh import make_mesh

    _, rt, img = tiled_setup
    monkeypatch.setenv("ONEDC_PIPELINE_CHUNK", "2")
    mesh = make_mesh(jax.devices("cpu")[:2])
    imgs = [img[:, 64 * (i % 2):64 * (i % 2) + 64, :64] for i in range(5)]
    streams = [rt.encode(im)[0] for im in imgs]
    outs = rt.decode_batch(streams, mesh=mesh)
    assert len(outs) == 5
    for s, o in zip(streams, outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(rt.decode(stream=s)),
                                   atol=5e-4)


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
