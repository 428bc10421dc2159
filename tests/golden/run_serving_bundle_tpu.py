"""Hardware validation of the FULL AOT serving bundle at product size.

Round 3 validated a single fused-decode artifact on the chip; this
drives the round-4 serving story end-to-end at 768x768 on real TPU:

  phase export  (model code):   flagship OneDC -> encode N streams,
                                live decode_batch reference outputs,
                                export_serving_bundle(768,768,B=4) +
                                flat safetensors weights -> WORKDIR
  phase serve   (NO model code): ServingDecoder(bundle, weights)
                                 .decode_batch(streams) on the chip;
                                 byte-compare vs the live outputs and
                                 report decodes/s from artifacts.

Two separate processes so the serve phase proves the bundle + weights
+ entropy host code are sufficient (the reference's serving story
imports its full torch training stack, ref src/inference.py:87-135).

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/run_serving_bundle_tpu.py export
    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/run_serving_bundle_tpu.py serve
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

WORKDIR = Path("/tmp/onedc_serving_bundle_tpu")
SIZE = 768
BATCH = 4
N_STREAMS = 6   # chunks of 4 + ragged 2 (exercises the pad path)


def to_bf16(tree):
    return jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t))(tree)


def export_phase():
    from onedc_tpu.models.onedc import OneDC, OneDCRuntime
    from onedc_tpu.utils.aot import export_serving_bundle, save_bundle
    from onedc_tpu.utils.calibrate import calibrate_stream_params
    from onedc_tpu.utils.checkpoint import save_safetensors

    model = OneDC(compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    # realistic-rate streams (bench calibration scale, ~0.07 bpp band)
    params = calibrate_stream_params(to_bf16(params), 0.05)
    rt = OneDCRuntime(model, params, dtype=jnp.bfloat16)
    rt.update(force=True)

    imgs = [jax.random.uniform(jax.random.fold_in(key, i),
                               (1, SIZE, SIZE, 3), minval=-1, maxval=1)
            for i in range(N_STREAMS)]
    enc = rt.encode_many(imgs)
    streams = [bytes(s) for s, _ in enc]
    bpps = [b["bpp"] for _, b in enc]
    outs = rt.decode_batch(streams)

    WORKDIR.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    arts = export_serving_bundle(rt, SIZE, SIZE, batch=BATCH)
    save_bundle(arts, WORKDIR / "bundle")
    save_safetensors(rt.params, WORKDIR / "bundle" / "weights.safetensors")
    t_export = time.perf_counter() - t0
    for i, (s, o) in enumerate(zip(streams, outs)):
        (WORKDIR / f"stream_{i}.bin").write_bytes(s)
        np.save(WORKDIR / f"want_{i}.npy", np.asarray(o, np.float32))
    (WORKDIR / "meta.json").write_text(json.dumps(
        {"n": N_STREAMS, "bpp_mean": float(np.mean(bpps))}))
    sizes = {p.name: p.stat().st_size
             for p in (WORKDIR / "bundle").iterdir()}
    print(f"export ok: {t_export:.1f}s, bpp_mean={np.mean(bpps):.4f}, "
          f"bundle bytes={sum(sizes.values())/1e6:.1f} MB "
          f"(weights {sizes.get('weights.safetensors', 0)/1e6:.1f} MB)")


def serve_phase():
    # Hard guarantee: no model code in this process.
    banned = [m for m in sys.modules
              if m.startswith(("onedc_tpu.models", "onedc_tpu.nn", "flax"))]
    assert not banned, banned

    from onedc_tpu.serving.decoder import ServingDecoder

    meta = json.loads((WORKDIR / "meta.json").read_text())
    n = meta["n"]
    streams = [(WORKDIR / f"stream_{i}.bin").read_bytes() for i in range(n)]
    wants = [np.load(WORKDIR / f"want_{i}.npy") for i in range(n)]

    t0 = time.perf_counter()
    dec = ServingDecoder(str(WORKDIR / "bundle"),
                         str(WORKDIR / "bundle" / "weights.safetensors"))
    t_load = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = dec.decode_batch(streams)
    jax.block_until_ready(outs[0])
    t_first = time.perf_counter() - t0
    for got, want in zip(outs, wants):
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=5e-4)

    t0 = time.perf_counter()
    outs = dec.decode_batch(streams)
    jax.block_until_ready(outs[0])
    t_warm = time.perf_counter() - t0
    assert not any(m.startswith(("onedc_tpu.models", "onedc_tpu.nn", "flax"))
                   for m in sys.modules), "serving path imported model code"
    print(f"serve ok: {n} streams match live decode exactly "
          f"(atol 5e-4); load {t_load:.1f}s, first {t_first:.1f}s, "
          f"warm {n/t_warm:.2f} decodes/s from artifacts "
          f"(bpp_mean={meta['bpp_mean']:.4f}, bucket {SIZE}x{SIZE}x{BATCH})")


if __name__ == "__main__":
    {"export": export_phase, "serve": serve_phase}[sys.argv[1]]()
