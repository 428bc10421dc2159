"""Headline benchmark: 768x768 one-step decodes per second per chip.

Runs the full flagship decode device path (hyperprior expand -> four-part
prior nets -> synthesis transform -> one-step SD UNet -> VAE decode) in
bf16 on one chip and reports throughput against the BASELINE target of 20
decodes/sec/chip (BASELINE.md "Rebuild target").

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_DECODES_PER_SEC = 20.0
SIZE = 768
WARMUP = 2
ITERS = 10


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from onedc_tpu.models.onedc import OneDC

    model = OneDC()
    key = jax.random.PRNGKey(0)

    # init on a small spatial size (params are size-independent), then
    # run the decode path at the benchmark size
    img_small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img_small)
    params = to_bf16(params)

    zh = zw = SIZE // 64
    z_indices = jax.random.randint(key, (1, zh, zw), 0, 16384)

    decode = jax.jit(lambda p, zi: model.apply(
        p, zi, method=model.decode_device_z_only))

    out = decode(params, z_indices)
    jax.block_until_ready(out)
    for _ in range(WARMUP - 1):
        jax.block_until_ready(decode(params, z_indices))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = decode(params, z_indices)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    decodes_per_sec = ITERS / dt
    print(json.dumps({
        "metric": f"{SIZE}x{SIZE} one-step decodes/sec/chip (bf16, device path)",
        "value": round(decodes_per_sec, 3),
        "unit": "decodes/s",
        "vs_baseline": round(decodes_per_sec / BASELINE_DECODES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
