"""AOT export of the serving decode programs (jax.export / StableHLO).

Production TPU serving wants the compiled program WITHOUT the model
stack: no flax, no tracing, no Python model code in the serving binary —
just a serialized artifact plus the weights. ``jax.export`` lowers a
jitted function to portable StableHLO bytes that a plain serving process
deserializes and calls. The reference has no equivalent (serving =
importing the full torch training stack).

Params stay an ARGUMENT of the exported function (supplied from
safetensors at serving time), so the artifact is a few MB of MLIR, not
gigabytes of embedded weights, and one artifact serves every checkpoint
of the same architecture.

Exported signatures (shapes are fixed at export; export one artifact per
serving bucket, e.g. 768x768 B=8):

- decode:  (params, y_hat[B,H/16,W/16,C], z_semantic[B,H/64,W/64,C])
           -> image[B,H,W,3]   (codec finish + one-step UNet + VAE)
- z-only:  (params, z_indices[B,H/64,W/64]) -> image[B,H,W,3]

The four-part prior stages stay in the host runtime (they're coupled to
the rANS loop); a serving process pairs this artifact with
``entropy``'s host coder exactly like ``OneDCRuntime.decode`` does.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _act_dtype(runtime):
    return runtime.dtype if runtime.dtype is not None else jnp.float32


def export_decode(runtime, height: int, width: int, batch: int = 1,
                  platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the fused decode program for a fixed serving shape.
    ``platforms`` e.g. ["tpu"] or ["tpu", "cpu"]; defaults to the
    default export platform of the running backend."""
    model = runtime.model
    assert height % 64 == 0 and width % 64 == 0, "export padded sizes"
    dt = _act_dtype(runtime)
    c = model.bottleneck_ch
    yh = jax.ShapeDtypeStruct((batch, height // 16, width // 16, c), dt)
    zs = jax.ShapeDtypeStruct((batch, height // 64, width // 64, c), dt)
    params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        runtime.params)

    fn = jax.jit(lambda p, y, z: model.apply(
        p, y, z, method=model.decode_device))
    exp = jax_export.export(fn, platforms=platforms)(params, yh, zs)
    return bytes(exp.serialize())


def export_decode_z_only(runtime, height: int, width: int, batch: int = 1,
                         platforms: Optional[Sequence[str]] = None
                         ) -> bytes:
    """Serialize the z-only decode (z_indices -> image)."""
    model = runtime.model
    assert model.z_only, "model must be the z-only variant"
    assert height % 64 == 0 and width % 64 == 0, "export padded sizes"
    zi = jax.ShapeDtypeStruct((batch, height // 64, width // 64), jnp.int32)
    params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        runtime.params)

    fn = jax.jit(lambda p, z: model.apply(
        p, z, method=model.decode_device_z_only))
    exp = jax_export.export(fn, platforms=platforms)(params, zi)
    return bytes(exp.serialize())


def load_exported(data: bytes):
    """Deserialize an artifact into a jittable callable — usable from a
    process that imports NONE of the model code (only jax + weights)."""
    return jax.jit(jax_export.deserialize(data).call)
