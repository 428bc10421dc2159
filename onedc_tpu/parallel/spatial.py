"""Spatially-sharded (SPMD) decode: split ONE image over the mesh.

The reference's only parallelism is data-parallel DDP (``src/ddp_configs/
ddp_4A100.yaml``) — the latency of a *single* decode is pinned to one
GPU. On TPU the fused decode program (codec finish + one-step UNet + VAE,
``models/onedc.py decode_device``) is a stack of convolutions and
windowed attention over NHWC activations, so it can be partitioned over
the mesh ``tensor`` axis by sharding the activations' H dim: XLA GSPMD
inserts the conv halo exchanges and attention (re)gathers over ICI
automatically. No model code changes — the same traced program, different
sharding anchors.

Mechanics: ``enable_spatial_decode(rt, mesh)`` re-jits an
``OneDCRuntime``'s heavy device programs with
``lax.with_sharding_constraint`` anchors on the big activations
(batch over ``data``, H over ``tensor``). Inputs arriving with any other
placement (replicated single-image decode, data-sharded batch decode)
are resharded at the program boundary, so every existing decode flavor —
``decode``, ``decode_batch``, the pipelined serving path, ``TiledCodec``
— picks up spatial sharding transparently.

When it pays: single-stream latency (one 768px image: UNet+VAE are
~90 ms on one chip — near the HBM bound, so 4-way spatial splits the
traffic ~4x for ~100 us of halo traffic over ICI) and high-resolution
tiles whose activations overflow one chip's HBM. For throughput serving,
batch over ``data`` instead (see ``OneDCRuntime.decode_batch``) — DP has
no halo cost.

Numerics: per-shard convolution partials are the same dot products, but
GroupNorm/attention reductions over the sharded H dim become psums whose
addition order differs from the single-device schedule — bitwise-equal
is NOT guaranteed, agreement to reduction-reorder tolerance is (asserted
by tests/test_spatial.py).

ENCODE is deliberately NOT sharded: the compress program picks rANS CDF
rows from prior-net scales, and the decoder recomputes those scales with
the replicated prior programs — if encode ran under a different
reduction schedule, a borderline scale could land one CDF row off and
the stream would decode to garbage. The bitstream-coupled programs
(compress, decompress begin/update) therefore always run the one
replicated schedule; only the post-bitstream NN stages are sharded here.
(Same reason the reference requires encoder/decoder to run the same
device kind.)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TENSOR_AXIS


def spatial_anchor(mesh: Mesh) -> NamedSharding:
    """The with_sharding_constraint anchor: H pinned to ``tensor``, batch
    left UNCONSTRAINED so propagation keeps the caller's placement —
    replicated for a single image, ``data``-sharded for batch serving.
    (Pinning batch to ``data`` would be illegal at B=1 on a >1 data axis;
    pinning it to None would silently de-shard batch serving.)"""
    return NamedSharding(mesh, P(P.UNCONSTRAINED, TENSOR_AXIS))


def _anchored(model, method_name: str, act: NamedSharding, n_in: int,
              quant=None):
    """jit of ``model.apply(..., method=<method_name>)`` with sharding
    anchors on the first ``n_in`` array inputs and on the output image.

    Anchoring only the LARGE activations (and letting GSPMD propagate to
    the small ones, e.g. z_semantic at H/64, which may have fewer rows
    than mesh shards) keeps the anchors legal at any image size.
    ``quant`` preserves the runtime's quantization mode — re-jitting
    must not silently revert a w8a8 runtime to exact."""
    from ..nn.quant import quant_methods

    def f(p, *xs):
        xs = tuple(
            jax.lax.with_sharding_constraint(x, act) if i < n_in else x
            for i, x in enumerate(xs))
        with quant_methods(quant):
            out = model.apply(p, *xs, method=method_name)
        return jax.lax.with_sharding_constraint(out, act)

    return jax.jit(f)


def enable_spatial_decode(rt, mesh: Mesh):
    """Re-jit ``rt``'s (an ``OneDCRuntime``) heavy decode programs with
    spatial shardings over ``mesh``. Mutates and returns ``rt``.

    The four-part prior programs (begin/update) stay replicated: they are
    ~6 ms of y-grid (H/16) work per step and their outputs feed the host
    rANS loop — sharding them would add gather latency for no win. The
    fused decode / x0 / VAE / z-only programs carry >95% of the decode
    FLOPs and all of the HBM traffic, and those are re-anchored here.
    """
    model = rt.model
    act = spatial_anchor(mesh)
    q = getattr(rt, "quant", None)
    # y_hat + z_semantic -> image (full fused decode); only y_hat (H/16)
    # is anchored — z_semantic's H/64 grid can be smaller than the axis
    rt._decode_dev = _anchored(model, "decode_device", act, n_in=1,
                               quant=q)
    # staged halves used by the pipelined serving path
    rt._decode_x0 = _anchored(model, "decode_device_x0", act, n_in=1,
                              quant=q)
    rt._decode_vae = _anchored(model, "decode_device_vae", act, n_in=1,
                               quant=q)
    # z-only variant: z_indices are (B, H/64, W/64) ints — tiny; leave
    # their placement to propagation and anchor only the output.
    rt._decode_z_only = _anchored(model, "decode_device_z_only", act,
                                  n_in=0, quant=q)
    rt.spatial_mesh = mesh
    return rt
