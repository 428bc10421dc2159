"""Bitstream-rate calibration for random-init models.

A freshly initialised OneDC model produces y residuals of O(1) against
O(1) predicted means, so its bitstreams run ~9.5 bpp — two orders of
magnitude above the released λ-family's 0.02–0.11 bpp band
(BASELINE.md:13-15, derived from the reference's published Kodak rate
points). Benchmarks timed on such streams overstate the host rANS cost
(~100x the realistic symbol volume, mostly bypass escapes) and distort
the CDF-index distribution the coder sees.

``calibrate_stream_params`` shrinks the symbol statistics into the
realistic band WITHOUT training: it scales the output heads of every
module that feeds the y quantizer — the encoder's final trans-coding
block, the prior-fusion / spatial-prior nets (mean & scale heads), and
the spatial-prior reduction. Because each of these stacks ends in
residual blocks whose identity path is either (a) an explicitly scaled
1x1 adaptor conv or (b) a passthrough of an already-scaled tensor, and
every non-identity branch terminates in a scaled conv, the blocks'
OUTPUTS become O(scale) end to end:

    y      = s * O(1)   (encoder tc_block1: dc.conv2/dc.adaptor/ffn.conv_out)
    means  = s * O(1)   (prior fusion + spatial priors, same three heads)
    scales = s * O(1) -> clamped at the coder's scale_min

so the quantized residuals round(y - means) concentrate on {0, ±1} with
occasional ±2 — the shape of a trained codec's symbol stream — and the
CDF indexes sit at the low-sigma end of the bank, as they do for real
checkpoints. The model stays a real end-to-end codec (encode/decode
still round-trip bit-exactly); only the rate statistics move.

This is a BENCHMARK calibration, not a training substitute: pick the
scale with ``pick_stream_scale`` so measured bpp lands in the target
band, and report the scale + bpp next to any throughput number
(bench.py:stage_lambda does both).
"""

from __future__ import annotations

from typing import Tuple

import jax

# Residual-branch TERMINAL convs: scaling these (kernel+bias) scales a
# block's additive contribution, while identity paths either carry an
# already-scaled tensor (raw passthrough) or are themselves a scaled
# conv (channel-change adaptor / nin_shortcut). GroupNorm inside the
# branches renormalizes its input, which is exactly why internal convs
# need no scaling — only the branch terminals do.
#   DepthConv: conv2 (+ adaptor identity when in!=out)
#   ConvFFN3:  conv_out
#   ResnetBlockVQ: conv2 (+ nin_shortcut quirk path)
#   AttnBlockVQ:   proj_out
_HEAD_NAMES = ("conv2", "adaptor", "conv_out", "nin_shortcut", "proj_out")

# codec-relative prefixes of the y-path output stacks. The encoder
# UNet's plain conv_out anchors the chain: everything after it is
# residual blocks whose terminals are scaled, so y = s * O(1) even when
# in==out blocks pass the identity through raw (and even though
# GroupNorm blocks are input-scale invariant).
_TARGET_PREFIXES = (
    ("enc", "unet", "conv_out"),
    ("enc", "tc_bottleneck"),
    ("enc", "tc_block0"),
    ("enc", "tc_block1"),
    ("y_prior_fusion",),
    ("y_spatial_prior",),
    ("y_spatial_prior_adaptor_1",),
    ("y_spatial_prior_adaptor_2",),
    ("y_spatial_prior_adaptor_3",),
    ("y_spatial_prior_reduction",),
)


def _is_head(path: Tuple[str, ...]) -> bool:
    """True for kernel/bias leaves that should be scaled."""
    if "codec" not in path:
        return False
    rel = path[path.index("codec") + 1:]
    for pref in _TARGET_PREFIXES:
        if rel[:len(pref)] == pref:
            # plain convs listed as full prefixes scale directly
            if pref[-1] in ("conv_out", "y_spatial_prior_reduction"):
                return True
            return any(n in rel for n in _HEAD_NAMES)
    return False


def calibrate_stream_params(params, scale: float):
    """Return a copy of ``params`` with the y-path output heads scaled.

    ``params`` is the full OneDC variables dict ({"params": {...}}), on
    host or device; leaves keep their dtype. ``scale`` in (0, 1]:
    smaller -> lower bpp. scale=1.0 returns the tree unchanged (still a
    copy). See module docstring for why this shrinks the stream rate.
    """

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if _is_head(path):
            return (tree * scale).astype(tree.dtype)
        return tree

    return jax.tree_util.tree_map(lambda x: x, walk(params, ()))


def pick_stream_scale(encode_bpp_fn, band=(0.02, 0.15),
                      candidates=(0.5, 0.35, 0.25, 0.18, 0.12, 0.08,
                                  0.05, 0.03)):
    """Sweep calibration scales until measured bpp lands in ``band``.

    ``encode_bpp_fn(scale) -> bpp_y`` encodes one probe image with the
    calibrated params and returns its y-stream bpp. Returns
    (scale, bpp). Falls back to the candidate with the lowest bpp if
    none lands in the band (still far below the random-init ~9.5)."""
    best = None
    for s in candidates:
        bpp = float(encode_bpp_fn(s))
        if best is None or bpp < best[1]:
            best = (s, bpp)
        if band[0] <= bpp <= band[1]:
            return s, bpp
    return best
