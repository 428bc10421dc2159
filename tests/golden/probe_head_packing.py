"""Head-packing A/B for the SD UNet's head_dim-40 attention (VERDICT r4
next-step 2 — the last open roofline question).

The UNet's /8 self-attention is 8 heads x D=40 over S=9216 tokens
(ref decoder_unet.py:32-305, SD1.5 layout). D=40 uses <=40 of the MXU's
128 lanes in the QK^T contraction and the AV output. Two packing ideas
from the review:

(a) pack 3 heads per 128-lane tile, block-diagonal: scores for heads
    {3g,3g+1,3g+2} in ONE matmul Q_cat[S,120] @ Kbd[3S,120]^T where
    Kbd[j+h*S] holds K_h[j] in lanes [40h:40h+40] and zeros elsewhere.
    Every output element is a real score — but the MXU multiplies the
    structural ZEROS too: total MACs = 3 * S^2 * 120 vs 3 * S^2 * 40
    unpacked, and the output is 3x more tiles. Packing can only win if
    a K=40 contraction costs the same MXU time as K=120 AND the extra
    output passes are free — measured below.
(b) fold heads into M: needs a K shared across heads, which per-head
    projections do not give; not expressible as one dense matmul.

Timing protocol: the axon runtime MEMOIZES identical executions and a
host fetch costs ~30 ms RPC (see bench.py stage_zonly), so every probe
runs R DISTINCT iterations inside ONE jitted lax.map reduced to a
scalar, and reports the slope between R=2 and R=10 (constant per-call
overhead cancels).

    PYTHONPATH=/root/repo:/root/.axon_site python tests/golden/probe_head_packing.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

S = 9216          # 96x96 tokens at /8 (768px)
HEADS = 8
D = 40
R_SMALL, R_LARGE = 2, 10


def slope_time(make_inputs, body):
    """Time-per-iteration of ``body`` over distinct inputs via the
    R=2 vs R=10 slope inside one jitted lax.map."""
    def many(xs):
        return jnp.sum(jax.lax.map(lambda x: body(x), xs))

    f = jax.jit(many)

    def run(r, seed):
        xs = make_inputs(r, seed)
        t0 = time.perf_counter()
        float(f(xs))
        return time.perf_counter() - t0

    run(R_SMALL, 0)   # compile
    run(R_LARGE, 1)   # compile large + warm
    t_s = run(R_SMALL, 2)
    t_l = run(R_LARGE, 3)
    return (t_l - t_s) / (R_LARGE - R_SMALL)


def qk_probe():
    print("-- 1. QK^T-shaped contraction [S,D]@[D,S], 8-head batch --",
          flush=True)
    k_fixed = {}
    for d in (40, 120, 128):
        k_fixed[d] = jax.random.normal(jax.random.PRNGKey(99 + d),
                                       (HEADS, S, d), jnp.bfloat16)

        def mk(r, seed, d=d):
            return jax.random.normal(jax.random.PRNGKey(seed),
                                     (r, HEADS, S, d), jnp.bfloat16)

        def body(q, d=d):
            s = jnp.einsum("hqd,hkd->hqk", q, k_fixed[d],
                           preferred_element_type=jnp.bfloat16)
            return jnp.sum(s.astype(jnp.float32))

        t = slope_time(mk, body)
        tf = 2 * HEADS * S * S * d / t / 1e12
        print(f"  D={d:4d}: {t*1e3:8.2f} ms/iter ({tf:6.1f} TF/s nominal)",
              flush=True)


def av_probe():
    print("-- 2. AV-shaped matmul [S,S]@[S,D], 8-head batch --", flush=True)
    for d in (40, 120, 128):
        v_fixed = jax.random.normal(jax.random.PRNGKey(7 + d),
                                    (HEADS, S, d), jnp.bfloat16)

        def mk(r, seed):
            # distinct score matrices per iteration: too big to hold R
            # of them; derive each from a small seed row inside the body
            return jax.random.normal(jax.random.PRNGKey(seed),
                                     (r, HEADS, S), jnp.bfloat16)

        def body(arow, v_fixed=v_fixed):
            a = arow[:, :, None] * jnp.ones((1, 1, S), jnp.bfloat16)
            o = jnp.einsum("hqk,hkd->hqd", a, v_fixed,
                           preferred_element_type=jnp.bfloat16)
            return jnp.sum(o.astype(jnp.float32))

        t = slope_time(mk, body)
        tf = 2 * HEADS * S * S * d / t / 1e12
        print(f"  D={d:4d}: {t*1e3:8.2f} ms/iter ({tf:6.1f} TF/s nominal, "
              "includes the A broadcast-materialize pass)", flush=True)


def packed_blockdiag_attention(q, k, v, scale):
    """(B,H,S,40) -> packed groups of 3 heads per 120-lane tile.

    Scores for a group in one matmul against the block-diagonal K; the
    softmax runs per S-block, AV per head. Mathematically identical to
    per-head attention (checked below at S=512).
    """
    b, h, s, d = q.shape
    g = (h + 2) // 3
    pad_h = g * 3 - h
    if pad_h:
        zq = jnp.zeros((b, pad_h, s, d), q.dtype)
        q, k, v = (jnp.concatenate([x, zq], axis=1) for x in (q, k, v))
    qc = q.reshape(b, g, 3, s, d).transpose(0, 1, 3, 2, 4).reshape(
        b, g, s, 3 * d)
    kg = k.reshape(b, g, 3, s, d)
    kbd = jnp.zeros((b, g, 3, s, 3, d), k.dtype)
    kbd = kbd.at[:, :, jnp.arange(3), :, jnp.arange(3), :].set(
        kg.transpose(2, 0, 1, 3, 4))
    kbd = kbd.reshape(b, g, 3 * s, 3 * d)
    scores = jnp.einsum("bgqd,bgkd->bgqk", qc, kbd,
                        preferred_element_type=jnp.float32) * scale
    scores = scores.reshape(b, g, s, 3, s)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bgqhk,bghkd->bgqhd", attn, v.reshape(b, g, 3, s, d))
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, g * 3, s, d)
    return out[:, :h]


def e2e_probe():
    print("-- 3. end-to-end 8-head self-attention (S=9216, D=40) --",
          flush=True)
    from onedc_tpu.nn.attention import einsum_attention, flash_attention_tpu

    scale = D ** -0.5
    kv_key = jax.random.PRNGKey(1000)
    k_fix = jax.random.normal(kv_key, (1, HEADS, S, D), jnp.bfloat16)
    v_fix = jax.random.normal(jax.random.fold_in(kv_key, 1),
                              (1, HEADS, S, D), jnp.bfloat16)

    def mk(r, seed):
        return jax.random.normal(jax.random.PRNGKey(seed),
                                 (r, 1, HEADS, S, D), jnp.bfloat16)

    for name, fn in (
        ("flash (pads D->128)",
         lambda q: flash_attention_tpu(q, k_fix, v_fix, scale)),
        ("packed block-diag 3/tile",
         lambda q: packed_blockdiag_attention(q, k_fix, v_fix, scale)),
    ):
        t = slope_time(mk, lambda q, fn=fn: jnp.sum(
            fn(q).astype(jnp.float32)))
        print(f"  {name}: {t*1e3:8.2f} ms/iter", flush=True)

    # correctness of the packed form at a small S
    ss = 512
    key = jax.random.PRNGKey(5)
    qs = jax.random.normal(key, (1, HEADS, ss, D), jnp.bfloat16)
    ks = jax.random.normal(jax.random.fold_in(key, 1),
                           (1, HEADS, ss, D), jnp.bfloat16)
    vs = jax.random.normal(jax.random.fold_in(key, 2),
                           (1, HEADS, ss, D), jnp.bfloat16)
    want = einsum_attention(qs.astype(jnp.float32), ks.astype(jnp.float32),
                            vs.astype(jnp.float32), scale)
    got = packed_blockdiag_attention(qs, ks, vs, scale)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    print(f"  packed max|err| vs einsum f32 (S={ss}): {err:.4f} "
          "(bf16 tolerance)", flush=True)


def cross_probe():
    print("-- 4. cross-attention (S=9216 queries, M=144 tokens, D=40) --",
          flush=True)
    from onedc_tpu.nn.attention import einsum_attention

    k_fix = jax.random.normal(jax.random.PRNGKey(2000),
                              (1, HEADS, 144, D), jnp.bfloat16)
    v_fix = jax.random.normal(jax.random.PRNGKey(2001),
                              (1, HEADS, 144, D), jnp.bfloat16)

    def mk(r, seed):
        return jax.random.normal(jax.random.PRNGKey(seed),
                                 (r, 1, HEADS, S, D), jnp.bfloat16)

    t = slope_time(mk, lambda q: jnp.sum(einsum_attention(
        q, k_fix, v_fix, D ** -0.5).astype(jnp.float32)))
    print(f"  einsum: {t*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    qk_probe()
    av_probe()
    e2e_probe()
    cross_probe()
