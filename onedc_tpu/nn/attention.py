"""Attention dispatch: einsum for small grids, fused kernels for large.

One-step decode at 768px puts 9216-token self-attention in the SD UNet's
/8 blocks; materializing (B, heads, 9216, 9216) scores in HBM is the main
perf cliff. ``multi_head_attention`` routes:

- seq < FLASH_MIN_SEQ (or CPU): plain einsum with f32 accumulation
- large seq on TPU: Pallas TPU flash attention
  (jax.experimental.pallas.ops.tpu.flash_attention) with head_dim padded
  to 128 lanes — O(seq) memory, no score materialization.

All call sites (SD UNet CrossAttention, UNet2DModel attention, VAE
windowed attention, VQGAN AttnBlock) use this entry point.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

FLASH_MIN_SEQ = 2048      # below this, einsum is faster and fusion is easy
_LANE = 128


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def einsum_attention(q, k, v, scale: float):
    """q (B,H,N,D), k/v (B,H,M,D) -> (B,H,N,D); f32 softmax accumulation."""
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def flash_attention_tpu(q, k, v, scale: float):
    """Pallas TPU flash attention; pads head_dim to the 128-lane tile."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )
    b, h, n, d = q.shape
    m = k.shape[2]
    d_pad = ((d + _LANE - 1) // _LANE) * _LANE
    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    def block(x):
        # largest tile that divides the sequence length
        for cand in (512, 384, 256, 128):
            if x % cand == 0:
                return cand
        return x  # caller guarantees x % 128 == 0 via can_flash()

    bq, bk = block(n), block(m)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk,
        block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk,
        block_q_dq=bq,
    )
    out = flash_attention(q, k, v, causal=False, sm_scale=scale,
                          block_sizes=sizes)
    return out[..., :d]


def can_flash(n: int, m: int) -> bool:
    return n % _LANE == 0 and m % _LANE == 0 and min(n, m) >= FLASH_MIN_SEQ


def multi_head_attention(q, k, v, scale: Optional[float] = None):
    """(B, H, N, D) x (B, H, M, D) -> (B, H, N, D), implementation chosen
    by sequence length and backend."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n, m = q.shape[2], k.shape[2]
    if _is_tpu() and can_flash(n, m):
        return flash_attention_tpu(q, k, v, scale)
    return einsum_attention(q, k, v, scale)


def multi_head_attention_bnhd(q, k, v, scale: Optional[float] = None):
    """(B, N, H, D) layout attention — avoids the lane-breaking head
    transpose.

    head_dim is often 40 (SD1.5): transposing (B,N,H,40) puts 40 in the
    lane dim and relayouts the tensor. The einsum path contracts directly
    in bnhd; the flash path pads D to 128 lanes *first* so its transpose
    is tile-aligned.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n, m = q.shape[1], k.shape[1]
    if _is_tpu() and can_flash(n, m):
        d = q.shape[-1]
        d_pad = ((d + _LANE - 1) // _LANE) * _LANE
        if d_pad != d:
            pad = [(0, 0), (0, 0), (0, 0), (0, d_pad - d)]
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        out = flash_attention_tpu(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3), scale)
        return out.transpose(0, 2, 1, 3)[..., :d]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)
