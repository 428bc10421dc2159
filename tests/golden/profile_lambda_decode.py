"""Per-stage profile of the lambda-family decode at 768x768 (flagship bf16).

Produces the numbers behind ROADMAP's traffic-budget table (VERDICT
round-2 item 4) and the pipelined-decode design (item 1):

- device program wall times: begin / update step / finish / UNet / VAE at
  B in {1, 8} (slope-timed inside one jit where possible),
- XLA cost analysis per stage (flops + bytes accessed -> roofline),
- host rANS decode per stream per step,
- device->host int16 index fetch latency.

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/profile_lambda_decode.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from onedc_tpu.models.onedc import OneDC, OneDCRuntime

SIZE = 768


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def cost(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"gflops": c.get("flops", 0) / 1e9,
            "mb": c.get("bytes accessed", 0) / 1e6}


def main():
    model = OneDC(compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    rt = OneDCRuntime(model, params, dtype=jnp.bfloat16)
    rt.update(force=True)
    crt = rt._codec_rt
    p = rt.params

    img = jax.random.uniform(key, (1, SIZE, SIZE, 3), minval=-1, maxval=1)
    stream, bpp = rt.encode(img)
    print(f"encode bpp={bpp['bpp']:.4f} y_bytes={bpp['bits_y'] // 8}")

    for B in (1, 8):
        zi = jax.random.randint(jax.random.PRNGKey(1), (B, 12, 12), 0, 16384)
        cp = {"params": p["params"]["codec"]}

        begin = crt._begin
        t_begin, st = timed(begin, cp, zi)
        idx = np.asarray(st["indexes_r"])
        # host rANS per step (fresh coders per run)
        coders = rt._codec_rt.make_stream_coders([bytes(stream)] * B)
        t0 = time.perf_counter()
        parts = [coders[i].decode_stream_with_indexes(idx[i])
                 for i in range(B)]
        t_rans = time.perf_counter() - t0
        y_q_r = jnp.asarray(np.stack(parts))

        upd = crt._update[0]
        t_upd, nxt = timed(upd, cp, y_q_r, st["means"], st["y_hat"],
                           st["common"])
        # fetch latency of the int16 indexes
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(nxt["indexes_r"])
        t_fetch = (time.perf_counter() - t0) / 5

        fin = crt._finish
        t_fin, (x_hat, y_sem) = timed(fin, cp, nxt["y_hat"],
                                      st["z_semantic"])

        dd = rt._decode_dev
        t_dd, _ = timed(dd, p, nxt["y_hat"], st["z_semantic"], reps=5)

        print(f"\nB={B}: begin={t_begin*1e3:.1f}ms upd={t_upd*1e3:.1f}ms "
              f"finish={t_fin*1e3:.1f}ms decode_dev={t_dd*1e3:.1f}ms "
              f"rans({B} streams, 1 step)={t_rans*1e3:.1f}ms "
              f"idx_fetch={t_fetch*1e3:.1f}ms")
        print(f"  per image: decode_dev={t_dd/B*1e3:.1f}ms "
              f"full-serial-est={(t_begin + 4*(t_upd + t_rans + t_fetch) + t_dd)/B*1e3:.1f}ms")
        for name, jitted, args in (
                ("begin", begin, (cp, zi)),
                ("update", upd, (cp, y_q_r, st["means"], st["y_hat"],
                                 st["common"])),
                ("decode_dev", dd, (p, nxt["y_hat"], st["z_semantic"]))):
            try:
                c = cost(jitted, *args)
                print(f"  cost[{name}]: {c['gflops']:.1f} GF "
                      f"{c['mb']:.0f} MB -> "
                      f"{c['gflops']/max(c['mb']/1e3, 1e-9):.0f} F/B")
            except Exception as e:
                print(f"  cost[{name}]: n/a ({e})")

    # stage split of decode_dev at B=1 (codec-finish / UNet / VAE)
    zi = jax.random.randint(jax.random.PRNGKey(1), (1, 12, 12), 0, 16384)
    cp = {"params": p["params"]["codec"]}
    st = crt._begin(cp, zi)
    x_hat, y_sem = crt._finish(cp, st["y_hat"], st["z_semantic"])

    unet_only = jax.jit(lambda pp, xh, ys: model.apply(
        pp, xh, ys, method=model.generate)[1])
    t_unet, x0 = timed(unet_only, p, x_hat, y_sem, reps=5)
    vae_only = jax.jit(lambda pp, z: model.apply(
        pp, z, method=model.vae_decode_image))
    t_vae, _ = timed(vae_only, p, x0.astype(jnp.bfloat16), reps=5)
    t_finish, _ = timed(crt._finish, cp, st["y_hat"], st["z_semantic"])
    print(f"\nstage split B=1: codec_finish={t_finish*1e3:.1f}ms "
          f"unet(+finish-gen)={t_unet*1e3:.1f}ms vae={t_vae*1e3:.1f}ms")
    for name, jitted, args in (
            ("unet+gen", unet_only, (p, x_hat, y_sem)),
            ("vae", vae_only, (p, x0.astype(jnp.bfloat16)))):
        c = cost(jitted, *args)
        print(f"  cost[{name}]: {c['gflops']:.1f} GF {c['mb']:.0f} MB")


if __name__ == "__main__":
    main()
