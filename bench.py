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
ITERS = 10      # normalization constant for dt below
N_SMALL = 2
N_LARGE = 10


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
    # Honest timing through the remote tunnel (see memory: the runtime
    # memoizes identical executions; block_until_ready doesn't guarantee
    # completion; a host fetch costs ~30 ms RPC): run N distinct decodes
    # inside ONE jitted lax.map, force a scalar fetch, and take the slope
    # between two N values to cancel constant per-call overhead.
    def many(p, zs):
        def one(zi):
            return jnp.mean(model.apply(p, zi[None],
                                        method=model.decode_device_z_only))
        return jnp.sum(jax.lax.map(one, zs))

    many_j = jax.jit(many)

    def run(n, seed):
        zs = jax.random.randint(jax.random.PRNGKey(seed), (n, zh, zw),
                                0, 16384)
        t0 = time.perf_counter()
        float(many_j(params, zs))
        return time.perf_counter() - t0

    run(N_SMALL, 0)  # compile+warm
    run(N_LARGE, 1)
    t_small = run(N_SMALL, 2)
    t_large = run(N_LARGE, 3)
    dt = (t_large - t_small) / (N_LARGE - N_SMALL) * ITERS

    decodes_per_sec = ITERS / dt
    print(json.dumps({
        "metric": f"{SIZE}x{SIZE} one-step decodes/sec/chip (bf16, device path)",
        "value": round(decodes_per_sec, 3),
        "unit": "decodes/s",
        "vs_baseline": round(decodes_per_sec / BASELINE_DECODES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
