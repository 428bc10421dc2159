"""Probe: three exact formulations of `nearest-2x upsample -> 3x3 conv`.

The VAE decoder's upsample convs touch the largest tensors in the whole
decode (768x768x256 bf16 = 302 MB per pass), so their HBM traffic is a
first-order term on a bandwidth-bound chip (ROADMAP "Perf" item 1).
`conv3x3(nearest2x(x))` admits two exact rewrites:

a) current: broadcast-upsample materialized, then 3x3 conv at full res
b) phase conv: one 3x3 conv at HALF res producing 4*Cout channels
   (per-phase kernels K_ab built by summing adjacent taps of W), then
   depth-to-space — reads at half res, same FLOPs
c) lhs-dilated conv: a single stride-2 transposed conv whose 4x4 kernel
   is conv(W, ones(2,2)) — zero per-phase bookkeeping, kernel built once

1D identity behind (b)/(c): out[2i]=W0 x[i-1]+(W1+W2) x[i];
out[2i+1]=(W0+W1) x[i]+W2 x[i+1]  =>  K4 = conv(W3, [1,1]).

Run (TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/probe_upsample_conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def variant_a(x, w):
    return conv3(up2(x), w)


def _phase_kernels(w):
    # w: (3,3,Ci,Co). Row transform for phase a: a=0 -> [W0, W1+W2],
    # a=1 -> [W0+W1, W2] (2-tap kernels over input rows [i-1+a, i+a]).
    r0 = jnp.stack([w[0], w[1] + w[2]])            # (2,3,Ci,Co)
    r1 = jnp.stack([w[0] + w[1], w[2]])
    out = []
    for ra in (r0, r1):
        c0 = jnp.stack([ra[:, 0], ra[:, 1] + ra[:, 2]], axis=1)  # (2,2,Ci,Co)
        c1 = jnp.stack([ra[:, 0] + ra[:, 1], ra[:, 2]], axis=1)
        out.extend([c0, c1])
    return out  # [K00, K01, K10, K11], each (2,2,Ci,Co)


def variant_b(x, w):
    ks = _phase_kernels(w)
    co = w.shape[-1]
    # phase (a,b) uses input rows [i-1+a, i+a] / cols [j-1+b, j+b]
    pads = [((1 - a, a), (1 - b, b)) for a in (0, 1) for b in (0, 1)]
    phases = jnp.concatenate(
        [jax.lax.conv_general_dilated(
            x, k, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))
         for k, p in zip(ks, pads)], axis=-1)      # (B,H,W,4*Co)
    b_, h, wd, _ = phases.shape
    # depth-to-space: channel blocks are (a,b) phase-major
    y = phases.reshape(b_, h, wd, 2, 2, co)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * wd, co)


def variant_c(x, w):
    # K4 = conv2d_full(W, ones(2,2)): K4[s,t] = sum of W taps (u,v) with
    # s in {u, u+1}, t in {v, v+1}
    k4 = (jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
          + jnp.pad(w, ((1, 0), (0, 1), (0, 0), (0, 0)))
          + jnp.pad(w, ((0, 1), (1, 0), (0, 0), (0, 0)))
          + jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0))))   # (4,4,Ci,Co)
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def gn(x):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, 32, c // 32)
    mu = g.mean(axis=(1, 2, 4), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    return ((g - mu) / jnp.sqrt(var + 1e-6)).reshape(b, h, w, c)


def timed(f, *a, reps=8):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    # VAE decoder upsample shapes at 768px decode (B=1 and B=8)
    shapes = [(1, 96, 96, 512), (1, 192, 192, 512), (1, 384, 384, 256),
              (8, 96, 96, 512), (8, 192, 192, 512), (8, 384, 384, 256)]
    for (b, h, w_, c) in shapes:
        x = jax.random.normal(key, (b, h, w_, c), jnp.bfloat16)
        w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c),
                               jnp.float32) / c).astype(jnp.bfloat16)

        fa = jax.jit(lambda x, w: gn(variant_a(x, w)))
        fb = jax.jit(lambda x, w: gn(variant_b(x, w)))
        fc = jax.jit(lambda x, w: gn(variant_c(x, w)))

        ya = fa(x, w)
        yb = fb(x, w)
        yc = fc(x, w)
        ea = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                   - yb.astype(jnp.float32))))
        ec = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                   - yc.astype(jnp.float32))))
        ta, tb, tc = timed(fa, x, w), timed(fb, x, w), timed(fc, x, w)
        # second alternating rep to de-noise (tunnel variance)
        ta2, tb2, tc2 = timed(fa, x, w), timed(fb, x, w), timed(fc, x, w)
        print(f"B={b} {h}x{w_}x{c}: a(up+conv)={min(ta,ta2)*1e3:.2f}ms "
              f"b(phase+d2s)={min(tb,tb2)*1e3:.2f}ms "
              f"c(lhs-dilated)={min(tc,tc2)*1e3:.2f}ms "
              f"max|a-b|={ea:.4f} max|a-c|={ec:.4f}", flush=True)


if __name__ == "__main__":
    main()
