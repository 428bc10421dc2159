"""AOT serving export (utils/aot.py): the fused decode serializes to a
StableHLO artifact that a model-code-free process deserializes and runs,
matching the live program exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.onedc import OneDC, OneDCRuntime
from onedc_tpu.utils.aot import (export_decode, export_decode_z_only,
                                 load_exported)

TINY = dict(
    internal_ch=64, bottleneck_ch=32, unet_ch_config=(32, 64, 64),
    ctrl_ch=32, sd_block_channels=(32, 32, 64, 64), context_dim=64,
    vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4,
)


@pytest.mark.slow
def test_export_decode_round_trip(tmp_path):
    model = OneDC(**TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    rt = OneDCRuntime(model, params)

    data = export_decode(rt, 64, 64, batch=1)
    assert isinstance(data, bytes) and len(data) > 0
    # artifact is program-only: far smaller than the weights it serves
    n_param_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(params))
    assert len(data) < n_param_bytes / 2

    p = tmp_path / "decode_64x64.stablehlo"
    p.write_bytes(data)
    fn = load_exported(p.read_bytes())

    y_hat = jax.random.normal(key, (1, 4, 4, 32))
    z_sem = jax.random.normal(key, (1, 1, 1, 32))
    got = fn(rt.params, y_hat, z_sem)
    want = rt._decode_dev(rt.params, y_hat, z_sem)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_export_z_only_round_trip():
    model = OneDC(z_only=True, **TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    rt = OneDCRuntime(model, params)

    fn = load_exported(export_decode_z_only(rt, 64, 64, batch=2))
    zi = jnp.zeros((2, 1, 1), jnp.int32)
    got = fn(rt.params, zi)
    want = rt._decode_z_only(rt.params, zi)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
