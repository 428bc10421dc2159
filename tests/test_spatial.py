"""Spatially-sharded SPMD decode: one image split over the mesh tensor
axis must agree with the single-device decode (reduction-reorder
tolerance) and actually shard the heavy activations.

The reference has no equivalent (DDP only); this is the TPU-native
single-stream latency lever (parallel/spatial.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.onedc import OneDC, OneDCRuntime
from onedc_tpu.parallel.mesh import TENSOR_AXIS, make_mesh
from onedc_tpu.parallel.spatial import enable_spatial_decode

TINY = dict(
    internal_ch=64,
    bottleneck_ch=32,
    unet_ch_config=(32, 64, 64),
    ctrl_ch=32,
    sd_block_channels=(32, 32, 64, 64),
    context_dim=64,
    vae_block_channels=(32, 32, 64, 64),
    vae_attn_patch=4,
)


@pytest.fixture(scope="module")
def rt_and_stream():
    model = OneDC(**TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    rt = OneDCRuntime(model, params)
    rt.update(force=True)
    stream, _ = rt.encode(img)
    return rt, stream


def test_spatial_decode_matches_single_device(rt_and_stream):
    rt, stream = rt_and_stream
    ref = np.asarray(rt.decode(stream=stream))

    mesh = make_mesh(jax.devices("cpu")[:8], tensor=4)  # 2x4 data x tensor
    enable_spatial_decode(rt, mesh)
    sp = np.asarray(rt.decode(stream=stream))

    assert sp.shape == ref.shape
    # conv partials are identical dot products; GroupNorm/attention psum
    # reorder across shards bounds the disagreement
    np.testing.assert_allclose(sp, ref, rtol=2e-4, atol=2e-4)


def test_spatial_anchors_shard_the_activations(rt_and_stream):
    rt, stream = rt_and_stream
    mesh = make_mesh(jax.devices("cpu")[:8], tensor=4)
    enable_spatial_decode(rt, mesh)

    # drive the fused program directly and inspect the output placement
    y_hat = jnp.zeros((1, 4, 4, 32))
    z_sem = jnp.zeros((1, 1, 1, 32))  # z_semantic carries bottleneck_ch
    out = rt._decode_dev(rt.params, y_hat, z_sem)
    # H really is split: each addressable shard holds H/4 rows
    shard_h = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_h == {out.shape[1] // 4}, shard_h
    assert TENSOR_AXIS in out.sharding.spec


def test_spatial_z_only_decode_matches(rt_and_stream):
    """The z-only program is anchored on its OUTPUT only (z_indices'
    H/64 grid can be smaller than the axis) — verify the sharded program
    still reproduces the replicated decode."""
    import jax.numpy as jnp

    rt, _ = rt_and_stream
    model_z = OneDC(z_only=True, **TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model_z.init({"params": key}, x))(img)
    rtz = OneDCRuntime(model_z, params)
    zi = jnp.zeros((1, 1, 1), jnp.int32)
    ref = np.asarray(rtz._decode_z_only(rtz.params, zi))

    mesh = make_mesh(jax.devices("cpu")[:8], tensor=4)
    enable_spatial_decode(rtz, mesh)
    sp = rtz._decode_z_only(rtz.params, zi)
    shard_h = {s.data.shape[1] for s in sp.addressable_shards}
    assert shard_h == {sp.shape[1] // 4}, shard_h
    np.testing.assert_allclose(np.asarray(sp), ref, rtol=2e-4, atol=2e-4)


def test_spatial_pipelined_serving_path(rt_and_stream):
    """decode_batch (the pipelined serving flavor) picks the anchors up
    transparently: same bytes in, same images out."""
    rt, stream = rt_and_stream
    refs = [np.asarray(t) for t in rt.decode_batch([stream, stream])]

    mesh = make_mesh(jax.devices("cpu")[:8], tensor=4)
    enable_spatial_decode(rt, mesh)
    sps = rt.decode_batch([stream, stream], mesh=mesh)
    for r, s in zip(refs, sps):
        np.testing.assert_allclose(np.asarray(s), r, rtol=2e-4, atol=2e-4)
