"""Remat training step + single-process distributed helpers."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from onedc_tpu.models.onedc import OneDC
from onedc_tpu.parallel.distributed import (
    initialize,
    is_main_process,
    process_allgather,
)
from onedc_tpu.train.step import create_train_state, make_train_step

TINY = dict(
    internal_ch=64, bottleneck_ch=32, unet_ch_config=(32, 64, 64),
    ctrl_ch=32, sd_block_channels=(32, 32, 64, 64), context_dim=64,
    vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4,
)


@pytest.mark.slow
def test_remat_step_matches_plain():
    model = OneDC(**TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    state0 = create_train_state(model, params, lr=1e-4, warmup_steps=0)

    plain = jax.jit(make_train_step(model, remat=False))
    remat = jax.jit(make_train_step(model, remat=True))
    rng = jax.random.PRNGKey(1)

    s1, m1 = plain(state0, {"image": img}, rng)
    s2, m2 = remat(state0, {"image": img}, rng)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-3)


def test_adafactor_step_runs():
    model = OneDC(**TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    state = create_train_state(model, params, lr=1e-4, warmup_steps=0,
                               optimizer="adafactor")
    step = jax.jit(make_train_step(model))
    state, metrics = step(state, {"image": img}, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


def test_distributed_single_process():
    initialize()  # no-op on one process
    assert is_main_process()
    out = process_allgather(jnp.ones(3))
    assert np.asarray(out).reshape(-1, 3).shape[0] == jax.process_count()
