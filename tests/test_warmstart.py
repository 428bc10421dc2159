"""Partial warm-start hooks (ref model_sd15_with_codec_stage1.py:125-148
``load_part_ckpt`` and model_sd15_with_codec_stage2.py:74-83): codec /
unet+LoRA / codeformer / guidance checkpoints fill ONLY their submodule
subtree before training. Shape-level tests via jax.eval_shape (no FLOPs):
a leaf that remains a ShapeDtypeStruct after porting provably kept its
init value; ndarray leaves came from the checkpoint."""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twins import codec_twin, guidance_twin

from onedc_tpu.config import Config
from onedc_tpu.models.dmd import SDGuidance
from onedc_tpu.models.onedc import OneDC
from onedc_tpu.train.trainer import load_part_ckpts
from onedc_tpu.utils.port_torch import port_guidance_checkpoint

TINY = dict(internal_ch=64, bottleneck_ch=32, unet_ch_config=[32, 64, 64],
            ctrl_ch=32, sd_block_channels=[32, 32, 64, 64], context_dim=64,
            vae_block_channels=[32, 32, 64, 64], vae_attn_patch=4)
GUID = dict(block_channels=(32, 32, 64, 64), context_dim=64)

log = logging.getLogger("test_warmstart")


def _leaves(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_leaves(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _onedc_abstract_params():
    model = OneDC(**TINY)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return jax.eval_shape(
        partial(model.init, {"params": jax.random.PRNGKey(0)}), img)


def test_load_part_ckpts_codec_only():
    params = _onedc_abstract_params()
    twin = codec_twin(ctrl_ch=TINY["ctrl_ch"],
                      internal_ch=TINY["internal_ch"],
                      bottleneck_ch=TINY["bottleneck_ch"],
                      unet_ch_config=TINY["unet_ch_config"])
    cfg = Config.wrap(dict(codec_ckpt=twin))  # in-memory state dict
    out = load_part_ckpts(params, cfg, log)

    flat = _leaves(out)
    codec = {k: v for k, v in flat.items() if k.startswith("params/codec/")}
    rest = {k: v for k, v in flat.items()
            if not k.startswith("params/codec/")}
    assert codec and all(isinstance(v, np.ndarray) for v in codec.values()), \
        "codec subtree must be fully covered (reference strict=True)"
    assert all(not isinstance(v, np.ndarray) for v in rest.values()), \
        "non-codec subtrees must keep their init values"


def test_load_part_ckpts_noop_without_keys():
    params = _onedc_abstract_params()
    assert load_part_ckpts(params, Config.wrap({}), log) is params


def test_load_part_ckpts_incomplete_codec_raises():
    params = _onedc_abstract_params()
    twin = codec_twin(ctrl_ch=TINY["ctrl_ch"],
                      internal_ch=TINY["internal_ch"],
                      bottleneck_ch=TINY["bottleneck_ch"],
                      unet_ch_config=TINY["unet_ch_config"])
    dropped = next(iter(twin))
    twin.pop(dropped)
    with pytest.raises(KeyError, match="does not cover"):
        load_part_ckpts(params, Config.wrap(dict(codec_ckpt=twin)), log)


def _guidance_abstract_params():
    guidance = SDGuidance(**GUID)
    lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((1, 77, GUID["context_dim"]), jnp.float32)
    return jax.eval_shape(
        partial(guidance.init, {"params": jax.random.PRNGKey(0)},
                method=guidance.generator_forward),
        lat, ctx, ctx, jax.random.PRNGKey(1))


def test_port_guidance_checkpoint_full():
    params = _guidance_abstract_params()
    twin = guidance_twin(block_channels=GUID["block_channels"],
                         context_dim=GUID["context_dim"])
    out = port_guidance_checkpoint(twin, params)
    flat = _leaves(out)
    for sub in ("real_unet", "fake_unet", "cls_pred_branch"):
        leaves = {k: v for k, v in flat.items()
                  if k.startswith(f"params/{sub}/")}
        assert leaves and all(isinstance(v, np.ndarray)
                              for v in leaves.values()), sub
    # layout transform really applied: cls conv0 OIHW -> HWIO
    got = flat["params/cls_pred_branch/conv0/kernel"]
    np.testing.assert_array_equal(
        got, twin["cls_pred_branch.0.weight"].transpose(2, 3, 1, 0))


def test_port_guidance_checkpoint_without_real_unet():
    """The reference deletes real_unet under gan_alone; such checkpoints
    must port with real_unet left at init (not an error)."""
    params = _guidance_abstract_params()
    twin = guidance_twin(block_channels=GUID["block_channels"],
                         context_dim=GUID["context_dim"], with_real=False)
    out = port_guidance_checkpoint(twin, params)
    flat = _leaves(out)
    real = {k: v for k, v in flat.items()
            if k.startswith("params/real_unet/")}
    fake = {k: v for k, v in flat.items()
            if k.startswith("params/fake_unet/")}
    assert all(not isinstance(v, np.ndarray) for v in real.values())
    assert all(isinstance(v, np.ndarray) for v in fake.values())


@pytest.mark.slow
def test_convert_weights_guidance_cli(tmp_path):
    """CLI: reference SDGuidance checkpoint -> our guidance safetensors
    (real init: compiles two UNets, hence slow-marked; the port logic
    itself is covered shape-level by the tests above)."""
    from safetensors.numpy import save_file

    from onedc_tpu.utils.checkpoint import load_safetensors
    from onedc_tpu.utils.convert_weights import main

    twin = guidance_twin(block_channels=GUID["block_channels"],
                         context_dim=GUID["context_dim"])
    src = tmp_path / "model_2.safetensors"
    save_file(twin, str(src))
    out = tmp_path / "guidance.safetensors"
    main(["guidance", "--src", str(src), "--out", str(out),
          "guidance.block_channels=[32, 32, 64, 64]",
          "guidance.context_dim=64"])
    loaded = load_safetensors(str(out))
    for sub in ("real_unet", "fake_unet", "cls_pred_branch"):
        assert sub in loaded["params"], sub
    got = np.asarray(loaded["params"]["cls_pred_branch"]["conv0"]["kernel"])
    np.testing.assert_array_equal(
        got, twin["cls_pred_branch.0.weight"].transpose(2, 3, 1, 0))
