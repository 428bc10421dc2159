"""DMD2 guidance: loss math, CFG batching, two-turn step functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.dmd import SDGuidance, add_noise
from onedc_tpu.nn.diffusion import make_alphas_cumprod

TINY = dict(block_channels=(32, 32, 64, 64), context_dim=32)
# latents at 64x64 (=512px image): cls head needs mid >= 8x8


@pytest.fixture(scope="module")
def guidance_setup():
    g = SDGuidance(**TINY)
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, 64, 64, 4)) * 0.2
    ctx = jax.random.normal(key, (1, 7, 32))
    params = jax.jit(lambda l, t, u: g.init(
        {"params": key}, l, t, u, jax.random.PRNGKey(1),
        method=g.generator_forward))(lat, ctx, ctx)
    return g, params, lat, ctx


def test_add_noise_interpolates():
    abar = make_alphas_cumprod()
    x0 = jnp.ones((1, 2, 2, 4))
    noise = jnp.zeros_like(x0)
    # t=0: nearly clean
    out = add_noise(x0, noise, jnp.array([0]), abar)
    assert float(jnp.abs(out - x0).max()) < 0.01
    # t=999: nearly destroyed
    out = add_noise(x0, noise, jnp.array([999]), abar)
    assert float(jnp.abs(out).max()) < 0.1


def test_generator_forward_losses(guidance_setup):
    g, params, lat, ctx = guidance_setup
    out = jax.jit(lambda p, l, t, u, r: g.apply(
        p, l, t, u, r, method=g.generator_forward))(
        params, lat, ctx, ctx, jax.random.PRNGKey(2))
    assert np.isfinite(float(out["loss_dm"]))
    assert np.isfinite(float(out["gen_cls_loss"]))
    assert float(out["gen_cls_loss"]) > 0  # softplus is positive


def test_dm_loss_grad_flows_to_latents_only(guidance_setup):
    g, params, lat, ctx = guidance_setup

    def loss_wrt_latents(l):
        out = g.apply(params, l, ctx, ctx, jax.random.PRNGKey(2),
                      method=g.generator_forward)
        return out["loss_dm"]

    grad = jax.jit(jax.grad(loss_wrt_latents))(lat)
    assert float(jnp.abs(grad).max()) > 0
    # detached-target MSE: d/dlatents loss = (lat - (lat-grad))/N = grad/N
    assert np.all(np.isfinite(np.asarray(grad)))


def test_guidance_forward_losses(guidance_setup):
    g, params, lat, ctx = guidance_setup
    real = lat + 0.1
    out = jax.jit(lambda p, f, r, t, u, rt, rng: g.apply(
        p, f, r, t, u, rt, rng, method=g.guidance_forward))(
        params, lat, real, ctx, ctx, ctx, jax.random.PRNGKey(3))
    assert np.isfinite(float(out["loss_fake_mean"]))
    assert np.isfinite(float(out["guidance_cls_loss"]))
    assert 0.0 <= float(out["pred_realism_on_real"]) <= 1.0


def test_two_turn_steps(guidance_setup):
    """One generator turn + one guidance turn with the tiny OneDC."""
    from onedc_tpu.models.onedc import OneDC
    from onedc_tpu.train.trainer_stage2 import (
        create_stage2_states,
        make_generator_step,
        make_guidance_step,
    )

    g, guid_params, _, ctx = guidance_setup
    onedc = OneDC(internal_ch=64, bottleneck_ch=32,
                  unet_ch_config=(32, 64, 64), ctrl_ch=32,
                  sd_block_channels=(32, 32, 64, 64), context_dim=64,
                  vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4)
    key = jax.random.PRNGKey(0)
    # 128px keeps the CPU compile/runtime small; ClsHead pads tiny mid
    # features so the GAN losses stay well-defined
    img = jax.random.uniform(key, (1, 128, 128, 3), minval=-1, maxval=1)
    onedc_params = jax.jit(
        lambda x: onedc.init({"params": key}, x))(img[:, :64, :64])

    gen_state, guid_state = create_stage2_states(
        onedc, onedc_params, g, guid_params)
    gen_step = jax.jit(make_generator_step(onedc, g))
    guid_step = jax.jit(make_guidance_step(g))

    gen_state, gmet, aux = gen_step(gen_state, guid_state.params,
                                    {"image": img}, ctx, ctx,
                                    jax.random.PRNGKey(5))
    assert np.isfinite(float(gmet["gen_total"]))
    assert aux["fake_latents"].shape == (1, 16, 16, 4)

    guid_state, qmet = guid_step(guid_state, aux["fake_latents"],
                                 aux["real_latents"], ctx, ctx,
                                 jax.random.PRNGKey(6))
    assert np.isfinite(float(qmet["guid_total"]))

    # frozen masks: vae/codec params unchanged in generator update,
    # real_unet unchanged in guidance update
    assert jnp.array_equal(
        jax.tree_util.tree_leaves(gen_state.params["params"]["codec"])[0],
        jax.tree_util.tree_leaves(onedc_params["params"]["codec"])[0])
    assert jnp.array_equal(
        jax.tree_util.tree_leaves(guid_state.params["params"]["real_unet"])[0],
        jax.tree_util.tree_leaves(guid_params["params"]["real_unet"])[0])


@pytest.mark.slow
def test_two_turn_steps_sharded_mesh(guidance_setup):
    """Stage-2 two-turn step with the batch sharded over the 8-device
    mesh and FSDP-sharded guidance state (VERDICT round-1 item 7)."""
    from onedc_tpu.models.onedc import OneDC
    from onedc_tpu.parallel.fsdp import shard_state
    from onedc_tpu.parallel.mesh import batch_sharding, make_mesh
    from onedc_tpu.train.trainer_stage2 import (
        create_stage2_states,
        make_generator_step,
        make_guidance_step,
    )

    g, guid_params, _, ctx = guidance_setup
    onedc = OneDC(internal_ch=64, bottleneck_ch=32,
                  unet_ch_config=(32, 64, 64), ctrl_ch=32,
                  sd_block_channels=(32, 32, 64, 64), context_dim=64,
                  vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (8, 64, 64, 3), minval=-1, maxval=1)
    onedc_params = jax.jit(
        lambda x: onedc.init({"params": key}, x))(img[:1])

    mesh = make_mesh(jax.devices("cpu")[:8])
    gen_state, guid_state = create_stage2_states(
        onedc, onedc_params, g, guid_params)
    guid_state = shard_state(mesh, guid_state)

    bs = batch_sharding(mesh)
    img = jax.device_put(img, bs)
    ctx8 = jax.device_put(jnp.tile(ctx, (8, 1, 1)), bs)

    gen_step = jax.jit(make_generator_step(onedc, g))
    guid_step = jax.jit(make_guidance_step(g))
    with mesh:
        gen_state, gmet, aux = gen_step(gen_state, guid_state.params,
                                        {"image": img}, ctx8, ctx8,
                                        jax.random.PRNGKey(5))
        guid_state, qmet = guid_step(guid_state, aux["fake_latents"],
                                     aux["real_latents"], ctx8, ctx8,
                                     jax.random.PRNGKey(6))
    assert np.isfinite(float(gmet["gen_total"]))
    assert np.isfinite(float(qmet["guid_total"]))
    # the guidance state is genuinely FSDP-sharded
    leaves = jax.tree_util.tree_leaves(guid_state.params)
    assert any(len(x.addressable_shards) == 8
               and x.addressable_shards[0].data.size < x.size
               for x in leaves if hasattr(x, "addressable_shards"))
    # batch stayed sharded through the step
    assert len(aux["fake_latents"].addressable_shards) == 8


def test_stage2_round_batch():
    """Batch rounding for the sharded stage-2 loop: round down to the
    data-axis multiple; repeat rows when the batch is smaller."""
    from onedc_tpu.train.trainer_stage2 import Stage2Trainer

    imgs = np.arange(10 * 2 * 2 * 3, dtype=np.float32).reshape(10, 2, 2, 3)
    caps = [f"c{i}" for i in range(10)]
    # 10 on an 8-axis -> 8
    out, oc = Stage2Trainer.round_batch(imgs, caps, 8)
    assert out.shape[0] == 8 and oc == caps[:8]
    # 4 on an 8-axis -> repeated to 8, captions aligned with rows
    out, oc = Stage2Trainer.round_batch(imgs[:4], caps[:4], 8)
    assert out.shape[0] == 8 and len(oc) == 8
    np.testing.assert_array_equal(out[4:], out[:4])
    assert oc == caps[:4] * 2
    # exact multiple is untouched
    out, oc = Stage2Trainer.round_batch(imgs[:8], caps[:8], 4)
    assert out.shape[0] == 8 and oc == caps[:8]


def test_stage2_eval_one_epoch(tmp_path):
    """Stage-2 eval (ref train_sd15_codec_stage2.py:242-304): pixel-loss
    eval of the generator forward, AvgDict means, used as the best-ckpt
    monitor. Unit-tested on a hand-assembled trainer (full construction
    needs a text encoder)."""
    import jax
    import numpy as np
    from types import SimpleNamespace

    from onedc_tpu.config import Config
    from onedc_tpu.data.datasets import (DataLoader, ImageFolderDataset,
                                         save_image)
    from onedc_tpu.models.onedc import OneDC
    from onedc_tpu.train.losses import RDLoss
    from onedc_tpu.train.trainer_stage2 import Stage2Trainer
    from onedc_tpu.utils.logging import get_logger, make_writer

    data_dir = tmp_path / "imgs"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        save_image(rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
                   data_dir / f"im{i}.png")

    tiny = dict(internal_ch=64, bottleneck_ch=32, unet_ch_config=(32, 64, 64),
                ctrl_ch=32, sd_block_channels=(32, 32, 64, 64),
                context_dim=64, vae_block_channels=(32, 32, 64, 64),
                vae_attn_patch=4)
    model = OneDC(**tiny)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))

    tr = Stage2Trainer.__new__(Stage2Trainer)
    tr.onedc = model
    tr.gen_state = SimpleNamespace(params=params)
    tr.rd_loss = RDLoss(lmbda=0.0)
    tr.eval_loader = DataLoader(ImageFolderDataset(str(data_dir)), 1,
                                drop_last=False)
    tr.writer = make_writer(tmp_path / "tb")
    tr.log = get_logger("test.stage2eval")
    tr.cfg = Config.wrap({})
    m = tr.eval_one_epoch(step=1)
    for key in ("total_loss", "pix", "lpips"):
        assert key in m, key
    assert np.isfinite(m["total_loss"])

    # no eval set -> no-op
    tr.eval_loader = None
    assert tr.eval_one_epoch(step=1) == {}
