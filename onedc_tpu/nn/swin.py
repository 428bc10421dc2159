"""Swin-style window attention blocks (Flax/NHWC).

Used by the Codeformer semantic-distillation head (ref
``src/modules/blocks/swin.py``): plain + shifted window attention pairs
with optional absolute per-window position embeddings, window 16.

TPU notes: windows are reshaped statically (batch*windows, tokens, dim) so
every attention is one batched MXU matmul; the shifted variant uses
``jnp.roll`` + additive masks precomputed at trace time (static shapes).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # additive mask value (float('-inf') breaks bf16 softmax)


@lru_cache(maxsize=None)
def _shift_masks(window_size: int, displacement: int):
    """(upper_lower, left_right) additive masks, each (w^2, w^2).

    Same geometry as the reference create_mask (swin.py:41-55): after a
    cyclic shift by -displacement, the last `displacement` rows (cols) of
    the window grid contain wrapped content that must not attend across
    the seam.
    """
    w = window_size
    d = displacement
    ul = np.zeros((w * w, w * w), np.float32)
    ul[-d * w:, :-d * w] = NEG_INF
    ul[:-d * w, -d * w:] = NEG_INF

    lr = np.zeros((w, w, w, w), np.float32)
    lr[:, -d:, :, :-d] = NEG_INF
    lr[:, :-d, :, -d:] = NEG_INF
    lr = lr.reshape(w * w, w * w)
    return ul, lr  # numpy: safe to cache across jax traces


class WindowAttention(nn.Module):
    """Multi-head attention inside non-overlapping windows
    (ref swin.py:64-135)."""

    dim: int
    heads: int
    head_dim: int
    window_size: int
    shifted: bool = False
    use_pos_embedding: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        ws = self.window_size
        assert h % ws == 0 and w % ws == 0, (h, w, ws)
        inner = self.heads * self.head_dim

        if self.shifted:
            disp = ws // 2
            x = jnp.roll(x, (-disp, -disp), axis=(1, 2))

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        nh, nw = h // ws, w // ws

        def to_windows(t):
            t = t.reshape(b, nh, ws, nw, ws, self.heads, self.head_dim)
            # (b, heads, windows, tokens, head_dim)
            t = t.transpose(0, 5, 1, 3, 2, 4, 6)
            return t.reshape(b, self.heads, nh * nw, ws * ws, self.head_dim)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = to_windows(q), to_windows(k), to_windows(v)

        dots = jnp.einsum("bhwid,bhwjd->bhwij", q, k,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.head_dim ** -0.5)

        if self.use_pos_embedding:
            pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                             (ws * ws, ws * ws))
            dots = dots + pos

        if self.shifted:
            ul, lr = _shift_masks(ws, ws // 2)
            win_row = jax.lax.broadcasted_iota(
                jnp.int32, (nh * nw,), 0) // nw          # window's grid row
            win_col = jax.lax.broadcasted_iota(
                jnp.int32, (nh * nw,), 0) % nw
            ul_sel = (win_row == nh - 1).astype(dots.dtype)  # last row wraps
            lr_sel = (win_col == nw - 1).astype(dots.dtype)  # last col wraps
            mask = (ul_sel[:, None, None] * ul[None]
                    + lr_sel[:, None, None] * lr[None])
            dots = dots + mask[None, None]

        attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhwij,bhwjd->bhwid", attn, v)
        out = out.reshape(b, self.heads, nh, nw, ws, ws, self.head_dim)
        out = out.transpose(0, 2, 4, 3, 5, 1, 6).reshape(b, h, w, inner)
        out = nn.Dense(self.dim, name="to_out")(out)

        if self.shifted:
            disp = ws // 2
            out = jnp.roll(out, (disp, disp), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    """pre-LN window attention + MLP, both residual (ref swin.py:138-164)."""

    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    window_size: int
    shifted: bool = False
    use_pos_embedding: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm_attn")(x)
        h = WindowAttention(self.dim, self.heads, self.head_dim,
                            self.window_size, self.shifted,
                            self.use_pos_embedding, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(name="norm_mlp")(x)
        h = nn.Dense(self.mlp_dim, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)  # exact erf, like torch nn.GELU
        h = nn.Dense(self.dim, name="mlp_2")(h)
        return x + h


class DualSwinBlock(nn.Module):
    """Plain + shifted window attention pair (ref swin.py:167-196), NHWC."""

    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    window_size: int
    use_pos_embedding: bool = False

    @nn.compact
    def __call__(self, x):
        x = SwinBlock(self.dim, self.heads, self.head_dim, self.mlp_dim,
                      self.window_size, shifted=False,
                      use_pos_embedding=self.use_pos_embedding,
                      name="block_w")(x)
        return SwinBlock(self.dim, self.heads, self.head_dim, self.mlp_dim,
                         self.window_size, shifted=True,
                         use_pos_embedding=False, name="block_sw")(x)
