"""Neural block parity tests: Flax NHWC blocks vs torch NCHW replicas.

Each torch replica follows the reference architecture definitions
(src/modules/dcvc.py, src/modules/vqgan/blocks.py); weights are copied
from the flax params so outputs must match to float tolerance. This also
exercises the torch->jax layout conversion rules used by the weight porter
(OIHW->HWIO etc.).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from onedc_tpu.nn.blocks import (
    AttnBlockVQ,
    ConvFFN3,
    DepthConv,
    DepthConvBlock4,
    GroupNorm,
    ResidualBlockUpsample,
    ResnetBlockVQ,
    SubpelConv1x1,
    pixel_shuffle,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def t2j_conv(w):  # OIHW -> HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def j_conv_params(tconv):
    p = {"kernel": t2j_conv(tconv.weight)}
    if tconv.bias is not None:
        p["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    return p


def run_pair(jmod, params, tmod, x_nchw):
    tout = tmod(torch.tensor(x_nchw)).detach().numpy()
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    jout = np.asarray(jax.jit(jmod.apply)(params, x_nhwc)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jout, tout, **TOL)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.normal(size=(2, 16, 3, 5)).astype(np.float32)
    tout = tnn.PixelShuffle(2)(torch.tensor(x)).numpy()
    jout = np.asarray(pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(jout.transpose(0, 3, 1, 2), tout, **TOL)


class TorchDepthConv(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = tnn.Sequential(tnn.Conv2d(in_ch, in_ch, 1), tnn.LeakyReLU(0.01))
        self.depth_conv = tnn.Conv2d(in_ch, in_ch, 3, padding=1, groups=in_ch)
        self.conv2 = tnn.Conv2d(in_ch, out_ch, 1)
        self.adaptor = tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        identity = self.adaptor(x) if self.adaptor is not None else x
        return self.conv2(self.depth_conv(self.conv1(x))) + identity


def test_depthconv_matches_torch(rng):
    for in_ch, out_ch in [(8, 8), (8, 16)]:
        tmod = TorchDepthConv(in_ch, out_ch).eval()
        jmod = DepthConv(in_ch, out_ch)
        params = {"params": {
            "conv1_0": j_conv_params(tmod.conv1[0]),
            "depth_conv": j_conv_params(tmod.depth_conv),
            "conv2": j_conv_params(tmod.conv2),
        }}
        if tmod.adaptor is not None:
            params["params"]["adaptor"] = j_conv_params(tmod.adaptor)
        x = rng.normal(size=(2, in_ch, 6, 7)).astype(np.float32)
        run_pair(jmod, params, tmod, x)


class TorchConvFFN3(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        internal = in_ch * 2
        self.conv = tnn.Conv2d(in_ch, internal * 2, 1)
        self.conv_out = tnn.Conv2d(internal, in_ch, 1)

    def forward(self, x):
        x1, x2 = self.conv(x).chunk(2, 1)
        out = tnn.functional.leaky_relu(x1, 0.1) + tnn.functional.leaky_relu(x2, 0.01)
        return x + self.conv_out(out)


def test_convffn3_matches_torch(rng):
    tmod = TorchConvFFN3(8).eval()
    jmod = ConvFFN3(8)
    params = {"params": {
        "conv": j_conv_params(tmod.conv),
        "conv_out": j_conv_params(tmod.conv_out),
    }}
    x = rng.normal(size=(1, 8, 5, 5)).astype(np.float32)
    run_pair(jmod, params, tmod, x)


class TorchRBU(tnn.Module):
    """ResidualBlockUpsample (dcvc.py:183-205)."""

    def __init__(self, in_ch, out_ch, r=2):
        super().__init__()
        self.subpel = tnn.Sequential(tnn.Conv2d(in_ch, out_ch * r * r, 1), tnn.PixelShuffle(r))
        self.conv = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.upsample = tnn.Sequential(tnn.Conv2d(in_ch, out_ch * r * r, 1), tnn.PixelShuffle(r))

    def forward(self, x):
        out = tnn.functional.leaky_relu(self.subpel(x), 0.01)
        out = tnn.functional.leaky_relu(self.conv(out), 0.1)
        return out + self.upsample(x)


def test_residual_block_upsample_matches_torch(rng):
    tmod = TorchRBU(8, 4).eval()
    jmod = ResidualBlockUpsample(8, 4)
    params = {"params": {
        "subpel_conv": {"conv": j_conv_params(tmod.subpel[0])},
        "conv": j_conv_params(tmod.conv),
        "upsample": {"conv": j_conv_params(tmod.upsample[0])},
    }}
    x = rng.normal(size=(1, 8, 4, 6)).astype(np.float32)
    run_pair(jmod, params, tmod, x)


def test_groupnorm_matches_torch(rng):
    x = rng.normal(size=(2, 64, 5, 5)).astype(np.float32) * 3 + 1
    tmod = tnn.GroupNorm(32, 64, eps=1e-6)
    with torch.no_grad():
        tmod.weight.copy_(torch.tensor(rng.normal(size=64).astype(np.float32)))
        tmod.bias.copy_(torch.tensor(rng.normal(size=64).astype(np.float32)))
    jmod = GroupNorm(32, 1e-6)
    params = {"params": {
        "scale": jnp.asarray(tmod.weight.detach().numpy()),
        "bias": jnp.asarray(tmod.bias.detach().numpy()),
    }}
    run_pair(jmod, params, tmod, x)


class TorchResnetVQ(tnn.Module):
    """vqgan/blocks.py ResnetBlock including the nin_shortcut quirk."""

    def __init__(self, in_ch, out_ch=None):
        super().__init__()
        self.in_ch = in_ch
        self.out_ch = in_ch if out_ch is None else out_ch
        self.norm1 = tnn.GroupNorm(32, in_ch, eps=1e-6)
        self.conv1 = tnn.Conv2d(in_ch, self.out_ch, 3, padding=1, bias=False)
        self.norm2 = tnn.GroupNorm(32, self.out_ch, eps=1e-6)
        self.conv2 = tnn.Conv2d(self.out_ch, self.out_ch, 3, padding=1, bias=False)
        if in_ch != self.out_ch:
            self.nin_shortcut = tnn.Conv2d(self.out_ch, self.out_ch, 1, bias=False)

    def forward(self, x):
        residual = x
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        if self.in_ch != self.out_ch:
            residual = self.nin_shortcut(h)  # quirk: applied to h, not x
        return h + residual


def _gn_params(tgn):
    return {"scale": jnp.asarray(tgn.weight.detach().numpy()),
            "bias": jnp.asarray(tgn.bias.detach().numpy())}


def test_resnet_vq_matches_torch(rng):
    for in_ch, out_ch in [(32, None), (32, 64)]:
        tmod = TorchResnetVQ(in_ch, out_ch).eval()
        jmod = ResnetBlockVQ(in_ch, out_ch)
        p = {
            "norm1": _gn_params(tmod.norm1),
            "conv1": {"kernel": t2j_conv(tmod.conv1.weight)},
            "norm2": _gn_params(tmod.norm2),
            "conv2": {"kernel": t2j_conv(tmod.conv2.weight)},
        }
        if out_ch is not None and in_ch != out_ch:
            p["nin_shortcut"] = {"kernel": t2j_conv(tmod.nin_shortcut.weight)}
        x = rng.normal(size=(1, in_ch, 6, 6)).astype(np.float32)
        run_pair(jmod, {"params": p}, tmod, x)


class TorchAttnVQ(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w_ = torch.bmm(q, k) * (c ** -0.5)
        w_ = torch.softmax(w_, dim=2)
        v = v.reshape(b, c, hh * ww)
        h = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


def test_attn_vq_matches_torch(rng):
    c = 32
    tmod = TorchAttnVQ(c).eval()
    jmod = AttnBlockVQ(c)
    p = {"params": {
        "norm": _gn_params(tmod.norm),
        "q": j_conv_params(tmod.q),
        "k": j_conv_params(tmod.k),
        "v": j_conv_params(tmod.v),
        "proj_out": j_conv_params(tmod.proj_out),
    }}
    x = rng.normal(size=(1, c, 5, 7)).astype(np.float32)
    run_pair(jmod, p, tmod, x)


def test_depthconvblock4_shapes(rng):
    jmod = DepthConvBlock4(8, 16)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
    params = jax.jit(jmod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(jmod.apply)(params, x)
    assert out.shape == (1, 6, 6, 16)


def test_subpel_conv_shapes(rng):
    jmod = SubpelConv1x1(4, 2)
    x = jnp.asarray(rng.normal(size=(1, 3, 3, 8)).astype(np.float32))
    params = jax.jit(jmod.init)(jax.random.PRNGKey(0), x)
    assert jax.jit(jmod.apply)(params, x).shape == (1, 6, 6, 4)


def test_upsample_conv2x_exact_and_param_compatible(rng):
    """UpsampleConv2x == nearest_up + nn.Conv (fp-reassociation tolerance)
    and its param tree matches nn.Conv's, so checkpoints/porters are
    unaffected by the fused rewrite."""
    import flax.linen as nn

    from onedc_tpu.nn.blocks import UpsampleConv2x, upsample_nearest_2x

    ci, co = 16, 12
    x = jnp.asarray(rng.normal(size=(2, 7, 5, ci)).astype(np.float32))
    fused = UpsampleConv2x(co)
    params = jax.jit(fused.init)(jax.random.PRNGKey(0), x)

    ref_conv = nn.Conv(co, (3, 3), padding=1)
    ref_params = jax.jit(ref_conv.init)(jax.random.PRNGKey(1),
                                        upsample_nearest_2x(x))
    assert (jax.tree_util.tree_map(jnp.shape, params)
            == jax.tree_util.tree_map(jnp.shape, ref_params))

    got = jax.jit(fused.apply)(params, x)
    want = jax.jit(lambda p, x: ref_conv.apply(
        p, upsample_nearest_2x(x)))(params, x)
    assert got.shape == (2, 14, 10, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # no-bias variant (TinyVAE decoder stage convs)
    fused_nb = UpsampleConv2x(co, use_bias=False)
    p_nb = jax.jit(fused_nb.init)(jax.random.PRNGKey(2), x)
    assert "bias" not in p_nb["params"]
    got_nb = jax.jit(fused_nb.apply)(p_nb, x)
    assert got_nb.shape == (2, 14, 10, co)
