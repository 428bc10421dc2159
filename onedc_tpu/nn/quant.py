"""Opt-in w8a8 quantized serving decode.

Why this exists: the round-4 roofline closure (ROADMAP Perf -2) showed
the two big decode stages — the one-step UNet and the VAE decoder — run
AT the chip's measured bf16 matmul rate, so HBM-traffic surgery is
exhausted and the device floor only moves with fewer FLOPs or a faster
multiply. The TPU MXU multiplies int8 at up to 2x its bf16 rate
(v5e: 394 TOPS int8 vs 197 TF/s bf16 spec); measured on this tunnel
chip (tests/golden/probe_int8.py) the realized ratio is 1.38x on a
square matmul chain and 1.24-1.44x at the decode's own conv shapes —
enough to move the ~64 ms/img B=8 device floor toward the 20
decodes/s/chip target.

Design (TPU-first dynamic quantization; the reference has no quantized
path — its serving decode is fp16/bf16 only, ref src/inference.py:96-135):

- **weights**: symmetric per-output-channel int8, quantized INSIDE the
  program from the bf16 params. No second param tree: checkpoints,
  porters and ``set_params`` hot-reload are unchanged, and the
  weight-quant pass is one cheap sweep over the (small) weights per
  program run, fused by XLA.
- **activations**: symmetric DYNAMIC int8 (abs-max -> scale ->
  round), with the finest granularity the op's linearity allows:
  per-IMAGE for convs (each output pixel mixes only its own sample's
  pixels) and per-TOKEN for dense (contraction is the last dim only).
  Per-batch-tensor scales were measured to couple images in a serving
  batch — one outlier image degraded its chunk-mates by >10 dB and
  made the decode batch-size-dependent; per-image scales restore
  batch invariance of the int8 path (integer conv accumulation is
  exact, so only the untouched bf16 ops can vary with batch). The
  reduce and the cast fuse into neighbouring elementwise work; no
  calibration state to ship or drift.
- conv/dense accumulate in int32 (``preferred_element_type``),
  dequantize with ``s_x * s_w[c_out]`` in f32, bias added afterwards,
  result cast back to the working dtype (bf16 at serving).
- **scope**: ONLY the quality-path stages — the UNet, the VAE
  *decoder*, and the TinyVAE decoder — and only in DECODE programs
  (``OneDCRuntime(quant="w8a8")`` wraps just the decode jits). The
  entropy-critical codec nets (four-part prior round trips, g_s, the
  semantic adaptor) always stay in the exact dtype: their outputs feed
  CDF indexes that must match the encoder bit-for-bit or the rANS
  stream desynchronizes.
- attention einsums stay bf16 (softmax ranges are quantization-hostile
  and their FLOP share at these grids is small).

Accuracy contract: w8a8 is a lossy serving mode, like TinyVAE. The
bench reports its throughput alongside a PSNR-vs-bf16 proxy; the true
quality delta needs real weights (BASELINE.md gate) — until then the
mode is opt-in and never the headline.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import UpsampleConv2x

# module-path prefixes that get quantized (decode-only quality stages)
QUANT_PREFIXES: Tuple[Tuple[str, ...], ...] = (
    ("unet",), ("vae", "decoder"), ("vae_tiny_dec",))

# lhs-dilated int8 conv (the fused upsample-conv) is gated so it can be
# A/B'd on hardware; read at trace time like ONEDC_UPSAMPLE_CONV.
_Q8_UPSAMPLE = os.environ.get("ONEDC_Q8_UPSAMPLE", "1") != "0"

# Roofline gate: dynamic int8 only pays where the op is MXU-bound.
# Quantization adds ~1.5 extra activation passes of HBM traffic per op
# (amax read + int8 write; the conv's own activation read halves, the
# int32->f32 epilogue widens the write), while the MXU term shrinks by
# the measured ~1.38x (probe_int8.py). A 3x3 conv's arithmetic
# intensity is ~4.5*C flops per activation byte (C = min(Cin, Cout)),
# so the win crosses zero at roughly C ~ 300 on a spec v5e
# (197 TF/s / 819 GB/s) and higher on bandwidth-degraded sessions —
# measured end-to-end on the 768px decode floor (ms/img B=8, one
# session, stage-timed): ungated 67.3 / gate320 65.3 / gate512 62.3
# vs bf16 63.6. gate512 cuts the UNet stage 4.5% (only >=512-ch convs
# quantize) and ties the VAE; gate320 loses because this tunnel chip's
# crossover sits at C~535 (probe ratio 78 TF/s / 201 GB/s). Default is
# the measured-best-on-real-hardware 512; drop toward ~320 on
# full-bandwidth chips. Ops narrower than the threshold on EITHER side
# run exact bf16. Trace-time constant.
_Q8_MIN_CH = int(os.environ.get("ONEDC_Q8_MIN_CH", "512"))


def _in_scope(path: Tuple[str, ...]) -> bool:
    return any(path[:len(p)] == p for p in QUANT_PREFIXES)


def _quantize(x: jnp.ndarray, axes: Optional[Sequence[int]] = None):
    """Symmetric int8 quantization. Returns (q_int8, scale_f32).

    ``axes`` are the reduction axes of the abs-max: everything but the
    output channel for weights, everything but the batch dim for conv
    activations, the last dim for dense activations; ``None`` ->
    per-tensor. Compute runs in f32 so bf16 inputs don't lose quant
    precision to the division; XLA keeps the widened values in
    registers.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf)) if axes is None else jnp.max(
        jnp.abs(xf), axis=tuple(axes), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _conv_pad(padding, rank: int = 2):
    """Mirror nn.Conv's padding canonicalization for the forms this
    codebase uses: str, int, per-dim int, per-dim (lo, hi) pairs."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return ((padding, padding),) * rank
    pads = []
    for p in padding:
        pads.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(pads)


def _int8_conv(x, kernel_f32, bias, strides, padding, groups,
               out_dtype, lhs_dilation=None):
    """x (NHWC any float) * kernel (HWIO f32) as int8 x int8 -> int32,
    dequantized to ``out_dtype``. Activation scales are per-IMAGE
    (exact under conv: output pixel b mixes only input pixels of
    sample b), so a serving batch's images quantize independently."""
    xq, sx = _quantize(x, axes=(1, 2, 3))           # sx: (B,1,1,1)
    kq, sk = _quantize(kernel_f32, axes=(0, 1, 2))  # per-output-channel
    acc = jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        lhs_dilation=lhs_dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sk.reshape(1, 1, 1, -1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _conv_w8a8(mod: nn.Conv, x):
    """Quantized replacement for nn.Conv.__call__ (NHWC, no dilation)."""
    kshape = tuple(mod.kernel_size) + (
        x.shape[-1] // mod.feature_group_count, mod.features)
    kernel = mod.param("kernel", mod.kernel_init, kshape, mod.param_dtype)
    bias = (mod.param("bias", mod.bias_init, (mod.features,),
                      mod.param_dtype) if mod.use_bias else None)
    out_dt = jnp.promote_types(x.dtype, kernel.dtype)
    strides = mod.strides or 1
    if isinstance(strides, int):
        strides = (strides,) * len(mod.kernel_size)
    return _int8_conv(x, kernel.astype(jnp.float32), bias, tuple(strides),
                      _conv_pad(mod.padding, len(mod.kernel_size)),
                      mod.feature_group_count, out_dt)


def _dense_w8a8(mod: nn.Dense, x):
    """Quantized replacement for nn.Dense.__call__."""
    kernel = mod.param("kernel", mod.kernel_init,
                       (x.shape[-1], mod.features), mod.param_dtype)
    bias = (mod.param("bias", mod.bias_init, (mod.features,),
                      mod.param_dtype) if mod.use_bias else None)
    out_dt = jnp.promote_types(x.dtype, kernel.dtype)
    # per-token activation scales (exact: the contraction is the last
    # dim only, so each output row is one token x one kernel column)
    xq, sx = _quantize(x, axes=(x.ndim - 1,))       # sx: (..., 1)
    kq, sk = _quantize(kernel.astype(jnp.float32), axes=(0,))
    acc = jax.lax.dot_general(
        xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sk.reshape(-1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dt)


def _upsample_w8a8(mod: UpsampleConv2x, x):
    """Quantized fused upsample-conv: build the 4x4 dilated-conv kernel
    in f32 first (adjacent-tap sums overflow int8), THEN quantize, so
    the int8 program keeps the half-res-read trick of
    ``upsample2x_conv3x3`` (blocks.py)."""
    kernel = mod.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, x.shape[-1], mod.features))
    bias = (mod.param("bias", nn.initializers.zeros, (mod.features,))
            if mod.use_bias else None)
    out_dt = jnp.promote_types(x.dtype, kernel.dtype)
    if bias is not None:
        out_dt = jnp.promote_types(out_dt, bias.dtype)
    k = kernel.astype(jnp.float32)
    k4 = (jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
          + jnp.pad(k, ((1, 0), (0, 1), (0, 0), (0, 0)))
          + jnp.pad(k, ((0, 1), (1, 0), (0, 0), (0, 0)))
          + jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0))))
    return _int8_conv(x, k4, bias, (1, 1), ((2, 2), (2, 2)), 1, out_dt,
                      lhs_dilation=(2, 2))


def _w8a8_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if (context.method_name != "__call__" or mod is None
            or not _in_scope(tuple(mod.path))):
        return next_fun(*args, **kwargs)
    feats = getattr(mod, "features", None)
    x = args[0] if args else None
    if (feats is None or x is None or not hasattr(x, "shape")
            or x.ndim < 2 or min(x.shape[-1], feats) < _Q8_MIN_CH):
        return next_fun(*args, **kwargs)  # below the roofline crossover
    if type(mod) is nn.Dense:
        return _dense_w8a8(mod, args[0])
    if type(mod) is nn.Conv:
        # fall through on features this path doesn't support (masked /
        # dilated convs) — none exist in the decode scopes today, but a
        # future module must degrade to exact, not miscompute
        dil = mod.kernel_dilation
        if (mod.mask is not None
                or (mod.input_dilation not in (None, 1) and
                    tuple(jnp.atleast_1d(jnp.asarray(
                        mod.input_dilation)).tolist()) != (1, 1))
                or (dil not in (None, 1) and tuple(dil) != (1, 1))):
            return next_fun(*args, **kwargs)
        return _conv_w8a8(mod, args[0])
    if type(mod) is UpsampleConv2x and _Q8_UPSAMPLE:
        return _upsample_w8a8(mod, args[0])
    return next_fun(*args, **kwargs)


def w8a8_methods():
    """Context manager activating w8a8 interception for flax applies
    traced under it. Wrap the BODY of the jitted function so the
    interception is baked into the compiled program::

        @jax.jit
        def decode(p, *a):
            with w8a8_methods():
                return model.apply(p, *a, method=...)
    """
    return nn.intercept_methods(_w8a8_interceptor)


def quant_methods(quant: Optional[str]):
    """``w8a8_methods()`` for ``quant="w8a8"``, a no-op context for
    ``None`` — for code that re-jits a runtime's decode programs
    (parallel/spatial.py, utils/aot.py) and must preserve its quant
    mode instead of silently reverting to exact."""
    if quant is None:
        import contextlib
        return contextlib.nullcontext()
    if quant == "w8a8":
        return w8a8_methods()
    raise ValueError(f"unknown quant mode {quant!r}")
