"""Probe: int8 vs bf16 MXU throughput on the real chip.

Round-4 roofline closure (ROADMAP Perf -2) showed the two big decode
stages (one-step UNet + VAE) run AT the chip's measured bf16 matmul
rate — traffic surgery is exhausted, only fewer FLOPs or a faster
multiply help. TPU v5e's MXU doubles its rate at int8 (397 TOPS spec
vs 197 TF/s bf16), so a w8a8-quantized serving decode is the one
remaining >1.2x lever. This probe answers, BEFORE any quantization
work: does XLA on this chip/tunnel actually hit ~2x on (a) a square
matmul chain, (b) a conv3x3 at the VAE's hot shape, (c) a conv3x3 at
the UNet mid shape?

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/probe_int8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _time(f, *args, reps=6):
    # two tunnel hazards (bench.py stage_zonly documents both): the
    # relay can memoize IDENTICAL executions, so every rep gets a
    # distinct traced scalar folded into the input; and
    # block_until_ready is not a reliable completion barrier, so sync
    # via float() scalar fetches (measured: 8 chained 4096^3 matmuls
    # "completed" in 35 us with ones-inputs + block_until_ready)
    float(f(jnp.int32(reps), *args))
    t0 = time.perf_counter()
    for i in range(reps):
        r = f(jnp.int32(i), *args)  # distinct arg per rep; in-order exec
    float(r)  # one fetch syncs the whole in-order chain
    return (time.perf_counter() - t0) / reps


def probe_matmul(n=4096, chain=8):
    key = jax.random.PRNGKey(0)
    a8 = jax.random.randint(key, (n, n), -127, 128, jnp.int8)
    b8 = jax.random.randint(jax.random.fold_in(key, 1), (n, n), -127, 128,
                            jnp.int8)
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    @jax.jit
    def f_bf16(i, a, b):
        x = a + i.astype(jnp.bfloat16)
        for _ in range(chain):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return jnp.float32(jnp.sum(x))

    @jax.jit
    def f_int8(i, a, b):
        # int32 accumulate, renormalize to int8 between links so every
        # link is a genuine int8 x int8 matmul
        x = (a.astype(jnp.int32) + i).astype(jnp.int8)
        for _ in range(chain):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = (y >> 12).astype(jnp.int8)
        return jnp.float32(jnp.sum(x.astype(jnp.int32)))

    flops = 2 * n**3 * chain
    tb = _time(f_bf16, ab, bb)
    print(f"matmul {n}x{n} chain{chain}: bf16 {flops/tb/1e12:.1f} TF/s "
          f"({tb*1e3:.1f} ms)", flush=True)
    ti = _time(f_int8, a8, b8)
    print(f"matmul {n}x{n} chain{chain}: int8 {flops/ti/1e12:.1f} TOP/s "
          f"({ti*1e3:.1f} ms) ({tb/ti:.2f}x)", flush=True)


def probe_conv(shape, cout, tag):
    b, h, w, c = shape
    key = jax.random.PRNGKey(7)
    x8 = jax.random.randint(key, shape, -127, 128, jnp.int8)
    k8 = jax.random.randint(jax.random.fold_in(key, 1), (3, 3, c, cout),
                            -127, 128, jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def f_bf16(i, x, k):
        y = x + i.astype(jnp.bfloat16)
        for _ in range(4):
            y = jax.lax.conv_general_dilated(
                y, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)[..., :c]
        return jnp.float32(jnp.sum(y))

    @jax.jit
    def f_int8(i, x, k):
        y = (x.astype(jnp.int32) + i).astype(jnp.int8)
        for _ in range(4):
            z = jax.lax.conv_general_dilated(
                y, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)[..., :c]
            y = (z >> 10).astype(jnp.int8)
        return jnp.float32(jnp.sum(y.astype(jnp.int32)))

    flops = 2 * b * h * w * 9 * c * cout * 4
    tb = _time(f_bf16, xb, kb)
    print(f"conv3x3 {tag} {shape}->C{cout}: bf16 {flops/tb/1e12:.1f} TF/s "
          f"({tb*1e3:.1f} ms)", flush=True)
    ti = _time(f_int8, x8, k8)
    print(f"conv3x3 {tag} {shape}->C{cout}: int8 {flops/ti/1e12:.1f} TOP/s "
          f"({ti*1e3:.1f} ms) ({tb/ti:.2f}x)", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    probe_matmul(chain=4)
    # VAE decode hot shape: 192px plane at 512ch (768px image, ds=4 up)
    probe_conv((1, 192, 192, 512), 512, "vae-hot")
    # UNet mid shape: 96px plane at 640ch
    probe_conv((1, 96, 96, 640), 640, "unet-mid")
    # batched serving shape
    probe_conv((8, 96, 96, 512), 512, "b8-mid")
