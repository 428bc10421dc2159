"""Swin window attention parity vs a torch replica + VQGAN/Codeformer
shape and invariance tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from onedc_tpu.models.codeformer import Codeformer, codeformer_losses
from onedc_tpu.nn.swin import DualSwinBlock, SwinBlock, WindowAttention
from onedc_tpu.nn.vqgan import MaskGitVQGAN, VectorQuantizer


class TorchWindowAttention(tnn.Module):
    """Replica of the reference WindowAttention (swin.py:64-135)."""

    def __init__(self, dim, heads, head_dim, window, shifted, use_pos):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.window, self.shifted, self.use_pos = window, shifted, use_pos
        self.to_qkv = tnn.Linear(dim, inner * 3, bias=False)
        self.to_out = tnn.Linear(inner, dim)
        if use_pos:
            self.pos = tnn.Parameter(torch.randn(window ** 2, window ** 2))

    def forward(self, x):  # x: (B, H, W, C)
        w = self.window
        if self.shifted:
            d = w // 2
            x = torch.roll(x, (-d, -d), dims=(1, 2))
        b, H, W, _ = x.shape
        nh, nw = H // w, W // w
        qkv = self.to_qkv(x).chunk(3, dim=-1)

        def wnd(t):
            t = t.reshape(b, nh, w, nw, w, self.heads, self.head_dim)
            return t.permute(0, 5, 1, 3, 2, 4, 6).reshape(
                b, self.heads, nh * nw, w * w, self.head_dim)

        q, k, v = map(wnd, qkv)
        dots = q @ k.transpose(-1, -2) * self.head_dim ** -0.5
        if self.use_pos:
            dots = dots + self.pos
        if self.shifted:
            d = w // 2
            ul = torch.zeros(w * w, w * w)
            ul[-d * w:, :-d * w] = float("-inf")
            ul[:-d * w, -d * w:] = float("-inf")
            lr = torch.zeros(w, w, w, w)
            lr[:, -d:, :, :-d] = float("-inf")
            lr[:, :-d, :, -d:] = float("-inf")
            lr = lr.reshape(w * w, w * w)
            dots[:, :, -nw:] += ul
            dots[:, :, nw - 1::nw] += lr
        attn = dots.softmax(-1)
        out = attn @ v
        out = out.reshape(b, self.heads, nh, nw, w, w, self.head_dim)
        out = out.permute(0, 2, 4, 3, 5, 1, 6).reshape(
            b, H, W, self.heads * self.head_dim)
        out = self.to_out(out)
        if self.shifted:
            d = w // 2
            out = torch.roll(out, (d, d), dims=(1, 2))
        return out


def _dense_params(tlin):
    p = {"kernel": jnp.asarray(tlin.weight.detach().numpy().T)}
    if tlin.bias is not None:
        p["bias"] = jnp.asarray(tlin.bias.detach().numpy())
    return p


def test_window_attention_matches_torch(rng):
    for shifted in (False, True):
        dim, heads, hd, win = 16, 2, 8, 4
        tmod = TorchWindowAttention(dim, heads, hd, win, shifted,
                                    use_pos=True).eval()
        jmod = WindowAttention(dim, heads, hd, win, shifted,
                               use_pos_embedding=True)
        params = {"params": {
            "to_qkv": _dense_params(tmod.to_qkv),
            "to_out": _dense_params(tmod.to_out),
            "pos_embedding": jnp.asarray(tmod.pos.detach().numpy()),
        }}
        x = rng.normal(size=(2, 8, 12, dim)).astype(np.float32)
        tout = tmod(torch.tensor(x)).detach().numpy()
        jout = np.asarray(jax.jit(jmod.apply)(params, jnp.asarray(x)))
        np.testing.assert_allclose(jout, tout, rtol=5e-4, atol=5e-4,
                                   err_msg=f"shifted={shifted}")


def test_dual_swin_block_shapes(rng):
    jmod = DualSwinBlock(32, 2, 16, 64, window_size=4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
    params = jax.jit(jmod.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(jmod.apply)(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_vector_quantizer_roundtrip(rng):
    vq = VectorQuantizer(num_embeddings=16, embedding_dim=8)
    h = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    params = vq.init(jax.random.PRNGKey(0), h)
    quant, idx = vq.apply(params, h)
    assert quant.shape == h.shape and idx.shape == (1, 4, 4)
    entries = vq.apply(params, idx, method=vq.get_codebook_entry)
    # quantized output == codebook entry at the argmin index
    np.testing.assert_allclose(np.asarray(quant), np.asarray(entries),
                               rtol=1e-6, atol=1e-6)
    # quantizing a codebook row returns its own index
    emb = params["params"]["embedding"]
    q2, i2 = vq.apply(params, emb[3].reshape(1, 1, 1, 8))
    assert int(i2[0, 0, 0]) == 3


def test_maskgit_vqgan_tiny(rng):
    model = MaskGitVQGAN(hidden=32, channel_mult=(1, 2), num_res_blocks=1,
                         z_channels=32, num_embeddings=16)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    params = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x,
                                          method=model.autoencode))(x)
    quant, idx = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert idx.shape == (1, 8, 8)  # one avg-pool for 2 resolutions
    assert quant.shape == (1, 8, 8, 32)
    recon = jax.jit(lambda p, i: model.apply(p, i, method=model.decode))(
        params, idx)
    assert recon.shape == x.shape
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0


def test_codeformer_tiny(rng):
    model = Codeformer(in_ch=32, codebook_size=16, window_size=4,
                       head_dim=16)
    sem = jnp.asarray(rng.normal(size=(1, 4, 4, 32)).astype(np.float32))
    params = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x))(sem)
    logits, probs = jax.jit(lambda p, x: model.apply(p, x))(params, sem)
    assert logits.shape == (1, 8, 8, 16)  # x2 upsample
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    codebook = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    tgt_idx = jnp.zeros((1, 8, 8), jnp.int32)
    tgt_quant = codebook[tgt_idx]
    ce, mse = codeformer_losses(logits, probs, tgt_idx, tgt_quant, codebook)
    assert np.isfinite(float(ce)) and np.isfinite(float(mse))
