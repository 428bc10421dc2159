"""Weight porter: name mapping, layout transforms, LoRA merge.

Torch replicas follow the *reference naming* exactly (Sequential indices
etc.) so the regex rules are exercised end-to-end; outputs must match the
flax modules after porting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from onedc_tpu.nn.blocks import DepthConvBlock4, ResidualBlockUpsample
from onedc_tpu.utils.checkpoint import unflatten_params
from onedc_tpu.utils.port_torch import (
    merge_lora,
    port_codec_state,
    port_state_dict,
    _DCVC_RULES,
)


class TorchDepthConvBlock4(tnn.Module):
    """Reference DepthConvBlock4 naming: block.0 DepthConv, block.1 ConvFFN3."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        dc = tnn.Module()
        dc.conv1 = tnn.Sequential(tnn.Conv2d(in_ch, in_ch, 1), tnn.LeakyReLU(0.01))
        dc.depth_conv = tnn.Conv2d(in_ch, in_ch, 3, padding=1, groups=in_ch)
        dc.conv2 = tnn.Conv2d(in_ch, out_ch, 1)
        if in_ch != out_ch:
            dc.adaptor = tnn.Conv2d(in_ch, out_ch, 1)
        ffn = tnn.Module()
        internal = out_ch * 2
        ffn.conv = tnn.Conv2d(out_ch, internal * 2, 1)
        ffn.conv_out = tnn.Conv2d(internal, out_ch, 1)
        self.block = tnn.ModuleList([dc, ffn])

    def forward(self, x):
        dc, ffn = self.block
        identity = dc.adaptor(x) if hasattr(dc, "adaptor") else x
        h = dc.conv2(dc.depth_conv(dc.conv1(x))) + identity
        x1, x2 = ffn.conv(h).chunk(2, 1)
        out = tnn.functional.leaky_relu(x1, 0.1) + tnn.functional.leaky_relu(x2, 0.01)
        return h + ffn.conv_out(out)


def test_dcb4_port_parity(rng):
    tmod = TorchDepthConvBlock4(8, 16).eval()
    state = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    # reference checkpoints carry names like "y_prior_fusion.0.block.0..."
    prefixed = {f"y_prior_fusion.0.{k}": v for k, v in state.items()}
    flat = port_codec_state(prefixed)
    assert all(k.startswith("y_prior_fusion/block0/") for k in flat)

    jmod = DepthConvBlock4(8, 16)
    sub = {k[len("y_prior_fusion/block0/"):]: v for k, v in flat.items()}
    params = {"params": unflatten_params(sub)}
    x = rng.normal(size=(1, 8, 6, 6)).astype(np.float32)
    tout = tmod(torch.tensor(x)).detach().numpy()
    jout = np.asarray(jax.jit(jmod.apply)(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_rbu_port_parity(rng):
    class TorchRBU(tnn.Module):
        def __init__(self, in_ch, out_ch, r=2):
            super().__init__()
            self.subpel_conv = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch * r * r, 1), tnn.PixelShuffle(r))
            self.conv = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
            self.upsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch * r * r, 1), tnn.PixelShuffle(r))

        def forward(self, x):
            out = tnn.functional.leaky_relu(self.subpel_conv(x), 0.01)
            out = tnn.functional.leaky_relu(self.conv(out), 0.1)
            return out + self.upsample(x)

    tmod = TorchRBU(8, 4).eval()
    state = {f"hyper_dec.to_entropy.1.{k}": v.detach().numpy()
             for k, v in tmod.state_dict().items()}
    flat = port_codec_state(state)
    assert all(k.startswith("hyper_dec/ent_up0/") for k in flat)
    sub = {k.split("/", 2)[2]: v for k, v in flat.items()}
    params = {"params": unflatten_params(sub)}
    jmod = ResidualBlockUpsample(8, 4)
    x = rng.normal(size=(1, 8, 4, 4)).astype(np.float32)
    tout = tmod(torch.tensor(x)).detach().numpy()
    jout = np.asarray(jax.jit(jmod.apply)(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_merge_lora_linear(rng):
    w = rng.normal(size=(6, 4)).astype(np.float32)
    a = rng.normal(size=(2, 4)).astype(np.float32)   # lora_A (r, in)
    b = rng.normal(size=(6, 2)).astype(np.float32)   # lora_B (out, r)
    state = {
        "x.to_q.base_layer.weight": w,
        "x.to_q.lora_A.default.weight": a,
        "x.to_q.lora_B.default.weight": b,
    }
    out = merge_lora(state, rank=2, alpha=4.0)
    expected = w + 2.0 * (b @ a)
    np.testing.assert_allclose(out["x.to_q.weight"], expected, rtol=1e-5)


def test_merge_lora_conv(rng):
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
    a = rng.normal(size=(2, 4, 3, 3)).astype(np.float32)
    b = rng.normal(size=(6, 2, 1, 1)).astype(np.float32)
    state = {
        "y.conv1.base_layer.weight": w,
        "y.conv1.lora_A.default.weight": a,
        "y.conv1.lora_B.default.weight": b,
    }
    out = merge_lora(state, rank=2, alpha=8.0)
    delta = np.einsum("or,rikh->oikh", b[:, :, 0, 0], a)
    np.testing.assert_allclose(out["y.conv1.weight"], w + 4.0 * delta,
                               rtol=1e-5)


def test_unmapped_name_raises(rng):
    state = {"mystery.0.weight": rng.normal(size=(4, 4, 1, 1)).astype(np.float32)}
    try:
        port_state_dict(state, _DCVC_RULES)
        raised = False
    except KeyError:
        raised = True
    assert raised


def test_convert_weights_cli_lpips_dists(tmp_path, rng):
    """convert_weights CLI: torch .pth -> our safetensors layouts, loaded
    back by the make_*_fn entry points."""
    import torch as t
    from onedc_tpu.utils import convert_weights as cw
    from onedc_tpu.nn.lpips import _VGG16_PLAN

    # synthetic torchvision-vgg16-features state dict
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg = {}
    in_ch = 3
    for i, ti in enumerate(conv_idx):
        out_ch = _VGG16_PLAN[i][0]
        # small magnitude: random weights at std 1 overflow f32 through
        # 13 conv layers (activations grow ~sqrt(9*C) per layer)
        vgg[f"features.{ti}.weight"] = t.randn(out_ch, in_ch, 3, 3) * 0.02
        vgg[f"features.{ti}.bias"] = t.randn(out_ch) * 0.01
        in_ch = out_ch
    t.save(vgg, tmp_path / "vgg.pth")

    # lpips package linear heads
    lins = {f"lin{k}.model.1.weight": t.rand(1, c, 1, 1)
            for k, c in enumerate([64, 128, 256, 512, 512])}
    t.save(lins, tmp_path / "lins.pth")
    cw.main(["lpips", "--vgg", str(tmp_path / "vgg.pth"),
             "--lins", str(tmp_path / "lins.pth"),
             "--out", str(tmp_path / "lpips.safetensors")])
    from onedc_tpu.nn.lpips import make_lpips_fn
    fn = make_lpips_fn(str(tmp_path / "lpips.safetensors"))
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    assert np.isfinite(float(fn(x, x)[0]))
    assert abs(float(fn(x, x)[0])) < 1e-5  # identical inputs -> ~0

    # DISTS package alpha/beta
    dists_w = {"alpha": t.rand(1, 1475, 1, 1), "beta": t.rand(1, 1475, 1, 1)}
    t.save(dists_w, tmp_path / "dists.pth")
    cw.main(["dists", "--vgg", str(tmp_path / "vgg.pth"),
             "--dists", str(tmp_path / "dists.pth"),
             "--out", str(tmp_path / "dists.safetensors")])
    from onedc_tpu.nn.dists import make_dists_fn
    dfn = make_dists_fn(str(tmp_path / "dists.safetensors"))
    assert abs(float(dfn(x, x)[0])) < 1e-4
