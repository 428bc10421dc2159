"""Probe: is the four-part prior decode batch-size-invariant on TPU?

Why this matters: the decoder RE-COMPUTES the CDF indexes from its own
prior-net outputs (models/codec.py:_rans_indexes); correctness of the
rANS decode requires those integer indexes to match the encoder's
bit-for-bit. The encoder computed them inside the fused encode program
at the ENCODE batch; serving decodes at other batch sizes (pipelined
chunks, AOT bucket batches). If XLA's numerics differ across batch
sizes enough to flip an index at a scale-bin boundary, the stream
desynchronizes and the image corrupts.

The signal: y_hat holds the DECODED SYMBOLS (+ means). A pure float
drift leaves y_hat within bf16 epsilon of the B=1 decode; a desync
shifts at least one symbol by >= 1 quant step. So max|Δy_hat| across
batch configs separates "cosmetic drift in the quality stages" from
"entropy-path corruption".

Uses the streams saved by run_serving_bundle_tpu.py's export phase
(same seed + calibration => same params).

    PYTHONPATH=/root/repo python tests/golden/probe_batch_invariance.py
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

WORKDIR = Path("/tmp/onedc_serving_bundle_tpu")
SIZE = 768


def to_bf16(tree):
    return jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t))(tree)


def main():
    from onedc_tpu.entropy.framing import decode_i
    from onedc_tpu.models.onedc import OneDC, OneDCRuntime
    from onedc_tpu.utils.calibrate import calibrate_stream_params

    model = OneDC(compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = calibrate_stream_params(to_bf16(params), 0.05)
    rt = OneDCRuntime(model, params, dtype=jnp.bfloat16)
    rt.update(force=True)
    crt = rt._codec_rt

    meta = json.loads((WORKDIR / "meta.json").read_text())
    n = meta["n"]
    streams = [(WORKDIR / f"stream_{i}.bin").read_bytes()
               for i in range(n)]
    decs = [decode_i(s, crt.fsq.index_bits, rt.ds) for s in streams]
    zh = zw = SIZE // rt.ds

    def four_part(sub):
        z_indices = np.stack([
            crt.fsq.unpack_indices(d["bit_stream_z"], zh * zw).reshape(
                zh, zw) for d in sub])
        coders = crt.make_stream_coders([d["bit_stream_y"] for d in sub])
        y_hat, z_sem = crt.run_four_part_decode(
            jnp.asarray(z_indices), coders)
        return np.asarray(y_hat, np.float32), np.asarray(z_sem, np.float32)

    # reference: every stream decoded alone (B=1)
    ref = [four_part(decs[i:i + 1]) for i in range(n)]
    print("B=1 decode done", flush=True)

    for bs in (2, 4, n):
        flips = 0
        drift = 0.0
        for c0 in range(0, n, bs):
            sub = decs[c0:c0 + bs]
            yh, _ = four_part(sub)
            for j in range(len(sub)):
                d = np.abs(yh[j] - ref[c0 + j][0])
                drift = max(drift, float(d.max()))
                flips += int((d > 0.5).sum())
        verdict = "DESYNC" if flips else "invariant (drift only)"
        print(f"batch={bs}: symbol flips={flips} "
              f"max|dy_hat|={drift:.3e}  -> {verdict}", flush=True)

    # and the final image: quantifies the pure quality-stage drift
    img_b1 = [np.asarray(rt._decode_dev(
        rt.params, jnp.asarray(ref[i][0], jnp.bfloat16),
        jnp.asarray(ref[i][1], jnp.bfloat16)), np.float32)
        for i in range(2)]
    yh4, zs4 = four_part(decs[:4])
    img_b4 = np.asarray(rt._decode_dev(
        rt.params, jnp.asarray(yh4, jnp.bfloat16),
        jnp.asarray(zs4, jnp.bfloat16)), np.float32)
    for i in range(2):
        d = img_b4[i:i + 1] - img_b1[i]
        mse = float(np.mean(d * d))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        print(f"image {i}: B=4-vs-B=1 decode_dev max|d|="
              f"{float(np.abs(d).max()):.4f} psnr={psnr:.1f} dB",
              flush=True)


if __name__ == "__main__":
    main()
