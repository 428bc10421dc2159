"""Full-layout checkpoint twins through the porter (VERDICT round-2 item 2).

``tests/twins.py`` synthesizes COMPLETE ``model.safetensors`` /
``model_1.safetensors`` state dicts from the public diffusers/peft layouts
(independent of our porter rules). Here they are pushed through
``port_onedc_checkpoint`` against the REAL flagship model tree:

- zero unmapped names in either direction (every checkpoint tensor finds a
  home; every model tensor under unet/codec is covered),
- exact shape match on every leaf,
- (slow) end-to-end ``OneDCRuntime`` encode/decode with the ported params
  produces finite output.

What this cannot validate: weight VALUES of real released checkpoints
(zero-egress image; see PARITY.md gap analysis — residual risk is now
values-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.onedc import OneDC
from onedc_tpu.utils.port_torch import port_onedc_checkpoint

from twins import codec_twin, sd_unet_twin


@pytest.mark.slow
def test_full_layout_twins_port_cleanly():
    """Name+shape coverage against the flagship tree. Zero device FLOPs,
    but the flagship twin is ~1.3B params of host numpy (generation +
    float64 LoRA merges + layout transposes) — tens of minutes wall, so
    slow-marked; tiny-geometry porter coverage stays in the fast loop
    (test_twin_rejects_renamed_keys, test_inference_cli's checkpoint_path
    test)."""
    model = OneDC()
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    img = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    ref = jax.eval_shape(lambda k, x: model.init({"params": k}, x), key, img)

    unet_sd = sd_unet_twin()
    codec_sd = codec_twin()
    # sanity on the twin itself: LoRA adapters really are present on the
    # reference target list, absent on conv_in / vae_reduction
    assert any(k.endswith("attn1.to_q.lora_A.default.weight")
               for k in unet_sd)
    assert any(k.endswith("resnets.0.conv1.lora_A.default.weight")
               for k in unet_sd)
    assert not any("conv_in" in k and "lora" in k for k in unet_sd)
    assert not any("vae_reduction" in k and "lora" in k for k in unet_sd)
    assert any(k.startswith("enc.unet.up_blocks.0.attentions.")
               for k in codec_sd)  # AttnUp at the deepest level

    # raises on any unmapped name, shape mismatch, or uncovered model leaf
    port_onedc_checkpoint(unet_path=unet_sd, codec_path=codec_sd,
                          reference_params=ref,
                          require_complete=("unet", "codec"))


def test_twin_rejects_renamed_keys():
    """The porter must fail loudly on drift, not silently skip."""
    model = OneDC(internal_ch=64, bottleneck_ch=32,
                  unet_ch_config=(32, 64, 64), ctrl_ch=32,
                  sd_block_channels=(32, 32, 64, 64), context_dim=64,
                  vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    img = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    ref = jax.eval_shape(lambda k, x: model.init({"params": k}, x), key, img)
    bogus = {"enc.pix_emb_striped.weight": np.zeros((192, 3, 8, 8),
                                                    np.float32)}
    with pytest.raises(KeyError):
        port_onedc_checkpoint(codec_path=bogus, reference_params=ref)
    with pytest.raises(KeyError, match="does not cover"):
        port_onedc_checkpoint(codec_path={}, reference_params=ref,
                              require_complete=("codec",))


@pytest.mark.slow
def test_twin_checkpoint_end_to_end_decode(tmp_path):
    """Flagship params ported from the twins -> real bitstream encode ->
    decode -> finite image. Run at a small spatial size (the porter path
    is size-independent); the Kodak-size run lives in
    tests/golden/run_twin_port_tpu.py + PARITY.md."""
    from safetensors.numpy import save_file

    from onedc_tpu.models.onedc import OneDCRuntime

    model = OneDC()
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))

    # exercise the real file path too: save -> load via safetensors
    unet_fp = str(tmp_path / "model.safetensors")
    codec_fp = str(tmp_path / "model_1.safetensors")
    save_file(sd_unet_twin(), unet_fp)
    save_file(codec_twin(), codec_fp)

    ported = port_onedc_checkpoint(
        unet_path=unet_fp, codec_path=codec_fp,
        reference_params=params, require_complete=("unet", "codec"))

    rt = OneDCRuntime(model, ported)
    rt.update(force=True)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 192, 3),
                             minval=-1, maxval=1)
    stream, bpp = rt.encode(img)
    assert bpp["bpp"] > 0
    out = rt.decode(stream=stream)
    assert out.shape == img.shape
    assert np.all(np.isfinite(np.asarray(out)))
