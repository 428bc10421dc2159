"""Pallas TPU kernels: 3x3 same-padding convolution (+fused GN/SiLU).

Measured reality on the tunnel v5e (updated round 2; do NOT trust the
round-1 "~40 TF/s ceiling" story): XLA's bf16 conv pipeline reaches
94-147 TF/s at the VAE/UNet shapes and is near this chip's throttled
HBM bound (~227 GB/s effective), so these kernels only TIE it here.
They are kept as opt-in substrates (ONEDC_FUSED_CONV=1|2) for
full-bandwidth chips where the fused variants save a full HBM pass of
the normalized tensor per conv.

Two designs, both decomposing conv3x3 into nine shifted
(M, Cin) x (Cin, Cout) MXU matmuls:

- v1 (`_conv3x3_pallas_single`): three dx-pre-shifted HBM copies built
  by XLA so every kernel DMA is tile-aligned; simple but 3x input
  traffic (loses end-to-end on a bandwidth-bound chip).
- v2 (`_conv3x3_v2_single`): SINGLE padded HBM input; the dx shifts are
  built once per K block as in-VMEM relayouts, and the GroupNorm
  affine + SiLU + zero-border mask run in-kernel (f32 VPU), so the raw
  x is the only HBM read. Bit-exact vs the XLA composition.

Constraints: stride 1, 3x3 kernel, Cin and Cout multiples of 128, H
divisible by the row block. Other shapes fall back to lax.conv.
Backward: custom VJP (dx via the same kernel with flipped/transposed
weights, dw via XLA; the fused op recomputes the unfused composition).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 8  # output image rows per grid step


def _kernel(x3_ref, w_ref, out_ref, slab_ref, sem_ref, *, n_k: int,
            width: int, slots: int):
    """slab_ref: (slots, 3, (ROWS+2)*W, 128) — ping-pong slots x 3 dx
    shifts (slots=1 when VMEM is tight; then DMA is serial).

    All slices are tile-aligned: slab rows are sliced at dy*W (W % 8 == 0)
    and the HBM source at i*ROWS*W; no reshapes happen in VMEM.
    """
    i = pl.program_id(0)

    def dma(slot, dx, k):
        return pltpu.make_async_copy(
            x3_ref.at[dx, pl.ds(i * ROWS * width, (ROWS + 2) * width),
                      pl.ds(k * LANE, LANE)],
            slab_ref.at[slot, dx], sem_ref.at[slot, dx])

    def start_all(slot, k):
        for dx in range(3):
            dma(slot, dx, k).start()

    def wait_all(slot, k):
        for dx in range(3):
            dma(slot, dx, k).wait()

    start_all(0, 0)
    acc = jnp.zeros((ROWS * width, LANE), jnp.float32)
    for k in range(n_k):
        slot = k % slots
        if slots > 1 and k + 1 < n_k:
            start_all(1 - slot, k + 1)   # overlap next K-block transfer
        wait_all(slot, k)
        for dx in range(3):
            for dy in range(3):
                xs = slab_ref[slot, dx,
                              pl.ds(dy * width, ROWS * width), :]
                acc = acc + jnp.dot(
                    xs, w_ref[dy, dx, pl.ds(k * LANE, LANE), :],
                    preferred_element_type=jnp.float32)
        if slots == 1 and k + 1 < n_k:
            start_all(0, k + 1)
    out_ref[:] = acc.astype(out_ref.dtype)


_VMEM_BUDGET = 13 * 1024 * 1024


def _conv3x3_pallas_single(x, w, mul=None, add=None, act=None):
    """x (H, W, Cin), w (3, 3, Cin, Cout) -> (H, W, Cout).

    ``mul``/``add`` (each (Cin,)) fold a per-channel affine (e.g. a
    GroupNorm whose stats were computed separately) and ``act`` an
    elementwise activation into the kernel's input staging: XLA fuses
    them into the pad/stack copies that build ``x3``, so the transformed
    tensor is never written to HBM on its own. Applied BEFORE padding so
    borders stay exactly zero (conv-of-silu(gn(x)) semantics).
    """
    if mul is not None:
        x = x * mul + add
    if act is not None:
        x = act(x)
    h, width, cin = x.shape
    cout = w.shape[-1]
    n_k = cin // LANE

    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))           # (H+2, W+2, C)
    x3 = jnp.stack([xp[:, 0:width], xp[:, 1:width + 1],
                    xp[:, 2:width + 2]])                 # (3, H+2, W, C)
    x3 = x3.reshape(3, (h + 2) * width, cin)

    slab_bytes = 3 * (ROWS + 2) * width * LANE * x.dtype.itemsize
    fixed = (ROWS * width * LANE * 4            # f32 acc
             + ROWS * width * LANE * x.dtype.itemsize   # out block
             + 9 * cin * LANE * x.dtype.itemsize)       # weights
    slots = 2 if (n_k > 1 and fixed + 2 * slab_bytes <= _VMEM_BUDGET) else 1

    grid = (h // ROWS, cout // LANE)
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, width=width, slots=slots),
        out_shape=jax.ShapeDtypeStruct((h * width, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # x3 stays in HBM
            pl.BlockSpec((3, 3, cin, LANE), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS * width, LANE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, 3, (ROWS + 2) * width, LANE), x.dtype),
            pltpu.SemaphoreType.DMA((slots, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * width * cin * cout * 9,
            bytes_accessed=(3 * h * width * cin + h * width * cout
                            ) * x.dtype.itemsize,
            transcendentals=0),
    )(x3, w)
    return out.reshape(h, width, cout)


def supports_pallas_conv(shape, w_shape) -> bool:
    if len(shape) != 4 or tuple(w_shape[:2]) != (3, 3):
        return False
    _, h, width, cin = shape
    cout = w_shape[-1]
    return (cin % LANE == 0 and cout % LANE == 0 and h % ROWS == 0
            and h * width >= 256 * 256)  # only worth it when spatial-heavy


@jax.custom_vjp
def conv3x3_same(x, w):
    """Batched NHWC 3x3 stride-1 same conv via the Pallas kernel."""
    if x.shape[0] == 1:
        return _conv3x3_pallas_single(x[0], w)[None]
    return jax.lax.map(lambda xi: _conv3x3_pallas_single(xi, w), x)


def _fwd(x, w):
    return conv3x3_same(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: correlate g with spatially-flipped, in/out-transposed kernels
    w_flip = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    if supports_pallas_conv(g.shape, w_flip.shape):
        dx = conv3x3_same(g, w_flip)
    else:
        dx = jax.lax.conv_general_dilated(
            g, w_flip, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dw via XLA (cheap relative to the forward at these shapes)
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).transpose(1, 2, 0, 3)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3_same.defvjp(_fwd, _bwd)


def conv3x3(x, w, bias: Optional[jnp.ndarray] = None, *,
            allow_pallas: bool = False):
    """Dispatching 3x3 same conv: Pallas on TPU for supported shapes,
    lax.conv otherwise.

    ``allow_pallas`` defaults to False: measured on the tunnel v5e the
    kernels tie XLA's bf16 conv pipeline at best (see module docstring),
    so XLA remains the default path.
    """
    use = (allow_pallas
           and jax.devices()[0].platform == "tpu"
           and supports_pallas_conv(x.shape, w.shape))
    if use:
        out = conv3x3_same(x, w)
    else:
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# Kernel v2: SINGLE-READ conv3x3 with fused affine+SiLU prologue
# ---------------------------------------------------------------------------
# The v1 kernel above pre-stages three dx-shifted HBM copies (tile-aligned
# DMAs, but 3x input traffic + an extra write pass — measured 4.6 ms of
# staging per 768x128 conv on a ~227 GB/s chip, which is why it loses to
# XLA end-to-end). v2 reads ONE padded HBM buffer and builds the dx
# shifts in VMEM (static sublane-offset slices -> cheap on-chip
# relayouts), with the GN-affine + SiLU + zero-border mask applied
# in-kernel so the normalized tensor never exists in HBM at all.

def _kernel_v2(xp_ref, w_ref, mul_ref, add_ref, out_ref, slab_ref,
               shift_ref, sem_ref, *, n_k: int, width: int, height: int,
               rows: int, fuse: bool):
    """xp_ref: (H+2, W+8, C) padded input in HBM (left pad 1, right pad
    7 for sublane headroom). The slab covers the FULL channel dim and is
    DMA'd + transformed + dx-shifted ONCE per spatial block (at the
    first cout block j==0; scratch persists across the sequential TPU
    grid), so the raw x really is read from HBM exactly once."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    cin = n_k * LANE

    @pl.when(j == 0)
    def _load_and_stage():
        cp = pltpu.make_async_copy(
            xp_ref.at[pl.ds(i * rows, rows + 2)], slab_ref, sem_ref)
        cp.start()
        cp.wait()
        if fuse:
            mul = mul_ref[0].astype(jnp.float32)
            add = add_ref[0].astype(jnp.float32)
            raw = slab_ref[...]
            # f32 VPU math (Mosaic miscompiles bf16 sigmoid broadcasts)
            t = (raw.astype(jnp.float32) * mul[None, None, :]
                 + add[None, None, :])
            t = t * jax.nn.sigmoid(t)
            # zero the padding so conv-of-silu(gn(x)) semantics hold:
            # cols < 1 or >= width+1 are W-padding; rows outside the
            # image are the top/bottom halo of the first/last block
            col = jax.lax.broadcasted_iota(
                jnp.int32, (rows + 2, width + 8, 1), 1)
            colmask = (col >= 1) & (col < width + 1)
            row = jax.lax.broadcasted_iota(
                jnp.int32, (rows + 2, width + 8, 1), 0) + i * rows
            rowmask = (row >= 1) & (row < height + 1)
            slab_ref[...] = jnp.where(
                colmask & rowmask, t, jnp.zeros_like(t)).astype(raw.dtype)
        slab = slab_ref[...]  # (rows+2, W+8, C)
        for dx in range(3):
            shift_ref[dx] = jax.lax.slice(
                slab, (0, dx, 0), (rows + 2, dx + width, cin))

    acc = jnp.zeros((rows * width, LANE), jnp.float32)
    for k in range(n_k):
        for dy in range(3):
            for dx in range(3):
                xs = shift_ref[dx, pl.ds(dy, rows), :,
                               pl.ds(k * LANE, LANE)]
                xs = xs.reshape(rows * width, LANE)
                acc = acc + jnp.dot(
                    xs, w_ref[dy, dx, pl.ds(k * LANE, LANE), :],
                    preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


_V2_BUDGET = 13 * 1024 * 1024


def _v2_rows_for(width: int, cin: int, itemsize: int):
    """Largest row block whose scratch fits the VMEM budget (None if
    even the smallest doesn't — caller falls back to XLA)."""
    for rows in (8, 6, 4, 2):
        slab = (rows + 2) * (width + 8) * cin * itemsize
        shifts = 3 * (rows + 2) * width * cin * itemsize
        acc = rows * width * LANE * 4
        outb = rows * width * LANE * itemsize
        wts = 9 * cin * LANE * itemsize
        ftmp = slab * 2  # transient f32 transform (at itemsize 2)
        if slab + shifts + acc + outb + wts + ftmp <= _V2_BUDGET:
            return rows
    return None


def _conv3x3_v2_single(x, w, mul=None, add=None):
    """Single-image single-read conv3x3 (+optional fused affine+silu).

    x (H, W, Cin); when mul/add are given the kernel computes
    conv(silu(x*mul+add)) with zero borders — the raw x is the ONLY HBM
    input, read exactly once (the normalized tensor never exists in
    HBM). Falls back to the XLA composition when the scratch would not
    fit VMEM (see _v2_rows_for).
    """
    h, width, cin = x.shape
    cout = w.shape[-1]
    n_k = cin // LANE
    fuse = mul is not None
    rows = _v2_rows_for(width, cin, x.dtype.itemsize)
    if rows is None or h % rows:
        t = x
        if fuse:
            t = jax.nn.silu(x * mul + add)
        return jax.lax.conv_general_dilated(
            t[None], w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    # (H+2, W+8, C): top/bottom halo rows + left pad 1 / right pad 7
    xp = jnp.pad(x, ((1, 1), (1, 7), (0, 0)))
    if fuse:
        mul2 = mul.reshape(1, cin)
        add2 = add.reshape(1, cin)
    else:  # dummies keep one kernel signature
        mul2 = jnp.ones((1, cin), x.dtype)
        add2 = jnp.zeros((1, cin), x.dtype)

    grid = (h // rows, cout // LANE)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, n_k=n_k, width=width, height=h,
                          rows=rows, fuse=fuse),
        out_shape=jax.ShapeDtypeStruct((h * width, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp stays in HBM
            pl.BlockSpec((3, 3, cin, LANE), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows * width, LANE),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, width + 8, cin), x.dtype),
            pltpu.VMEM((3, rows + 2, width, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * h * width * cin * cout * 9,
            bytes_accessed=(h * width * cin + h * width * cout
                            ) * x.dtype.itemsize,
            transcendentals=h * width * cin if fuse else 0),
    )(xp, w, mul2, add2)
    return out.reshape(h, width, cout)


# ---------------------------------------------------------------------------
# Fused GroupNorm-affine + SiLU + conv3x3 (the VAE decoder tail pattern)
# ---------------------------------------------------------------------------

def _gn_silu_conv_ref(x, mul, add, w, bias):
    """Unfused XLA composition (differentiable reference)."""
    h = jax.nn.silu(x * mul[:, None, None, :] + add[:, None, None, :])
    out = jax.lax.conv_general_dilated(
        h, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias if bias is not None else out


@jax.custom_vjp
def _gn_silu_conv_fused(x, mul, add, w, bias):
    """Pallas path: the affine+SiLU fuse into the conv kernel itself —
    ONEDC_FUSED_CONV=2 selects the single-read v2 kernel (raw x is the
    only HBM input; the normalized tensor never exists in HBM),
    ONEDC_FUSED_CONV=1 the v1 staged kernel."""
    import os
    v2 = os.environ.get("ONEDC_FUSED_CONV") == "2"

    def one(args):
        xi, mi, ai = args
        if v2:
            return _conv3x3_v2_single(xi, w, mi, ai)
        return _conv3x3_pallas_single(xi, w, mi, ai, jax.nn.silu)

    if x.shape[0] == 1:
        out = one((x[0], mul[0], add[0]))[None]
    else:
        out = jax.lax.map(one, (x, mul, add))
    return out + bias if bias is not None else out


def _gnsc_fwd(x, mul, add, w, bias):
    return _gn_silu_conv_fused(x, mul, add, w, bias), (x, mul, add, w, bias)


def _gnsc_bwd(res, g):
    # recompute through the unfused composition: exact training gradients
    # without a hand-written kernel VJP
    _, vjp = jax.vjp(_gn_silu_conv_ref, *res)
    return vjp(g)


_gn_silu_conv_fused.defvjp(_gnsc_fwd, _gnsc_bwd)


def affine_silu_conv3x3(x, mul, add, w, bias=None,
                        allow_pallas: bool = True):
    """conv3x3(silu(x * mul + add)) + bias with the per-channel affine
    (typically GroupNorm stats) folded into the conv's input path — the
    VAE decoder's hot pattern (ref autoencoders ResnetBlock2D:
    norm -> silu -> conv). mul/add: (B, C).

    On TPU for supported shapes the application + SiLU fuse into the
    Pallas conv staging (the normalized tensor never round-trips HBM);
    otherwise the unfused XLA composition runs. Differentiable (backward
    recomputes the unfused composition).
    """
    # promote like flax nn.Conv would (mixed f32 input / bf16 params)
    cdtype = jnp.promote_types(x.dtype, w.dtype)
    x = x.astype(cdtype)
    w = w.astype(cdtype)
    if bias is not None:
        bias = bias.astype(cdtype)
    mul = mul.astype(cdtype)
    add = add.astype(cdtype)
    # Measured on the tunnel v5e (768px bf16): v1 (3x HBM staging) LOSES
    # to XLA end-to-end (4.8 vs 12.5 decodes/s); v2 (single-read, fused
    # affine+silu+mask, bit-exact vs the composition) TIES XLA within
    # run-to-run noise (~5 ms per 768x128 conv either way) because this
    # chip's HBM is throttled (~227 GB/s) and XLA's conv pipeline is
    # already near that bound. Kept opt-in (ONEDC_FUSED_CONV=1|2) for
    # full-bandwidth chips, where v2's one-fewer-HBM-pass should win.
    import os
    use = (allow_pallas
           and os.environ.get("ONEDC_FUSED_CONV", "0") in ("1", "2")
           and jax.devices()[0].platform == "tpu"
           and supports_pallas_conv(x.shape, w.shape))
    if use:
        return _gn_silu_conv_fused(x, mul, add, w, bias)
    return _gn_silu_conv_ref(x, mul, add, w, bias)


def gn_silu_conv3x3(x, gn_scale, gn_bias, w, bias=None, num_groups=32,
                    eps=1e-6, allow_pallas: bool = True):
    """GroupNorm -> SiLU -> conv3x3 with stats via MXU einsums
    (blocks.group_norm_affine) and fused application."""
    from ..nn.blocks import group_norm_affine
    mul, add = group_norm_affine(x, gn_scale, gn_bias, num_groups, eps)
    return affine_silu_conv3x3(x, mul, add, w, bias,
                               allow_pallas=allow_pallas)
