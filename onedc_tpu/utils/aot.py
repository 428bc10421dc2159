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


def _quality_program(runtime, method):
    """jit a decode-quality-stage program honoring the runtime's quant
    mode (OneDCRuntime(quant="w8a8") must export w8a8 artifacts, or the
    served numbers silently diverge from the live runtime's). The
    entropy-critical begin/update programs never go through here."""
    from ..nn.quant import quant_methods

    model = runtime.model
    q = getattr(runtime, "quant", None)

    def f(p, *a):
        with quant_methods(q):
            return model.apply(p, *a, method=method)
    return jax.jit(f)


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

    fn = _quality_program(runtime, model.decode_device)
    exp = jax_export.export(fn, platforms=platforms)(params, yh, zs)
    return bytes(exp.serialize())


def export_encode(runtime, height: int, width: int, batch: int = 1,
                  platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the fused device half of ENCODE (VAE cond + codec
    compress -> rANS write plan; ``models/onedc.py:encode_device``) for
    a fixed padded shape. Encode is exact in every quant mode (the
    entropy path must be bit-identical across runtimes), so this never
    goes through the quantized program builder. Pairs with the host
    bridge in ``serving/encoder.py:ServingEncoder``."""
    model = runtime.model
    assert height % 64 == 0 and width % 64 == 0, "export padded sizes"
    img = jax.ShapeDtypeStruct((batch, height, width, 3),
                               _act_dtype(runtime))
    params = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        runtime.params)
    fn = jax.jit(lambda p, x: model.apply(p, x, method=model.encode_device))
    exp = jax_export.export(fn, platforms=platforms)(params, img)
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

    fn = _quality_program(runtime, model.decode_device_z_only)
    exp = jax_export.export(fn, platforms=platforms)(params, zi)
    return bytes(exp.serialize())


def load_exported(data: bytes):
    """Deserialize an artifact into a jittable callable — usable from a
    process that imports NONE of the model code (only jax + weights)."""
    return jax.jit(jax_export.deserialize(data).call)


# ---------------------------------------------------------------------------
# staged serving bundle: the PIPELINED production path as artifacts
# ---------------------------------------------------------------------------

def export_serving_bundle(runtime, height: int, width: int, batch: int = 8,
                          platforms: Optional[Sequence[str]] = None
                          ) -> dict:
    """Export the STAGED decode programs the pipelined serving schedule
    dispatches (serving/pipeline.py): begin, update0..3 (int16 + int8
    symbol signatures), x0, vae — plus the fused single-program decode
    AND the encode device half. A serving process pairs these with the
    host rANS loop (``serving/decoder.py:ServingDecoder`` for decode,
    ``serving/encoder.py:ServingEncoder`` for encode) and runs the full
    λ path with no model code. Returns {name: bytes} plus a "meta" dict
    (shapes + host-loop constants)."""
    model = runtime.model
    assert height % 64 == 0 and width % 64 == 0, "export padded sizes"
    dt = _act_dtype(runtime)

    params_s = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        runtime.params)
    zi = jax.ShapeDtypeStruct((batch, height // 64, width // 64), jnp.int32)

    begin_fn = jax.jit(lambda p, z: model.apply(
        p, z, method=model.codec_decompress_begin))
    st = jax.eval_shape(begin_fn, params_s, zi)
    # rANS symbols arrive int16 (the native coder's dtype) OR int8 (the
    # serving pipeline narrows chunks whose symbols fit — the common case
    # on trained streams; serving/pipeline._narrow_symbols). Export BOTH
    # signatures per step so the artifact path matches the live runtime.
    yqr = jax.ShapeDtypeStruct(st["indexes_r"].shape, jnp.int16)
    yqr8 = jax.ShapeDtypeStruct(st["indexes_r"].shape, jnp.int8)
    means = jax.ShapeDtypeStruct(st["means"].shape, st["means"].dtype)
    yhat = jax.ShapeDtypeStruct(st["y_hat"].shape, st["y_hat"].dtype)
    common = jax.ShapeDtypeStruct(st["common"].shape, st["common"].dtype)
    zsem = jax.ShapeDtypeStruct(st["z_semantic"].shape,
                                st["z_semantic"].dtype)

    arts = {"begin": bytes(
        jax_export.export(begin_fn, platforms=platforms)(
            params_s, zi).serialize())}
    for s in range(4):
        step_fn = jax.jit(lambda p, yq, m, yh, c, _s=s: model.apply(
            p, _s, yq, m, yh, c, method=model.codec_decompress_update))
        arts[f"update{s}"] = bytes(
            jax_export.export(step_fn, platforms=platforms)(
                params_s, yqr, means, yhat, common).serialize())
        arts[f"update{s}_i8"] = bytes(
            jax_export.export(step_fn, platforms=platforms)(
                params_s, yqr8, means, yhat, common).serialize())

    x0_fn = _quality_program(runtime, model.decode_device_x0)
    arts["x0"] = bytes(jax_export.export(x0_fn, platforms=platforms)(
        params_s, yhat, zsem).serialize())
    x0_s = jax.eval_shape(x0_fn, params_s, yhat, zsem)
    vae_fn = _quality_program(runtime, model.decode_device_vae)
    arts["vae"] = bytes(jax_export.export(vae_fn, platforms=platforms)(
        params_s, jax.ShapeDtypeStruct(x0_s.shape, x0_s.dtype)).serialize())
    arts["decode"] = export_decode(runtime, height, width, batch,
                                   platforms)
    arts["encode"] = export_encode(runtime, height, width, batch,
                                   platforms)

    arts["meta"] = {
        "height": height, "width": width, "batch": batch,
        "ds": runtime.ds,
        "z_fsq_levels": list(model.z_fsq_levels),
        "dtype": jnp.dtype(dt).name,
        "indexes_dtype": jnp.dtype(st["indexes_r"].dtype).name,
        "symbol_dtypes": ["int16", "int8"],
        "quant": getattr(runtime, "quant", None),
        "vae": "large" if runtime.model.use_large_vae else "tiny",
    }
    return arts


def save_bundle(arts: dict, out_dir) -> None:
    """Write a bundle dict to ``out_dir`` (*.stablehlo + meta.json)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, data in arts.items():
        if name == "meta":
            with open(os.path.join(out_dir, "meta.json"), "w") as f:
                json.dump(data, f, indent=1)
        else:
            with open(os.path.join(out_dir, f"{name}.stablehlo"),
                      "wb") as f:
                f.write(data)


def main(argv=None):
    """CLI: export a serving bundle for a bucket.

    python -m onedc_tpu.utils.aot --config cfg.yaml \\
        --bucket 768x768x8 --out bundles/768 [--save-weights]
    """
    import argparse

    from ..config import load_config
    from ..eval.inference import build_model, load_params

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--config", default=None, help="model config yaml")
    p.add_argument("--bucket", required=True,
                   help="HxWxB serving bucket, e.g. 768x768x8")
    p.add_argument("--out", required=True, help="bundle output dir")
    p.add_argument("--save-weights", action="store_true",
                   help="also write weights.safetensors next to the "
                        "bundle (flat '/'-keyed, ServingDecoder format)")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu (default: current)")
    args, overrides = p.parse_known_args(argv)

    cfg = load_config(args.config, overrides)
    h, w, b = (int(t) for t in args.bucket.split("x"))
    model = build_model(cfg)
    params = load_params(model, cfg)

    from ..models.onedc import OneDCRuntime, ensure_tiny_vae_params
    dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else None
    # quant=w8a8 exports int8 quality-stage artifacts; vae=tiny exports
    # the taesd decode path (meta records both)
    vae_mode = cfg.get("vae")
    if vae_mode == "tiny":
        params = ensure_tiny_vae_params(model, params)
    rt = OneDCRuntime(model, params, dtype=dtype, quant=cfg.get("quant"),
                      vae=vae_mode)
    platforms = args.platforms.split(",") if args.platforms else None

    arts = export_serving_bundle(rt, h, w, batch=b, platforms=platforms)
    save_bundle(arts, args.out)
    if args.save_weights:
        import os

        from .checkpoint import save_safetensors
        save_safetensors(rt.params,
                         os.path.join(args.out, "weights.safetensors"))
    names = ", ".join(sorted(k for k in arts if k != "meta"))
    print(f"bundle written to {args.out}: {names}")


if __name__ == "__main__":
    main()
