"""Full-size stage-2 (DMD2) two-turn step measured on one chip.

VERDICT round-2 item 3 / SURVEY hard part 6: student OneDC (1.33B) +
real/fake SD1.5 UNet pair + GAN head resident together, generator turn +
guidance turn at 512px, Adafactor + remat, frozen submodule params held
in bf16 (the reference keeps real_unet bf16, sd_guidance.py). Prints
measured s/step per turn and peak HBM.

    PYTHONPATH=/root/repo:$PYTHONPATH python tests/golden/run_stage2_full_tpu.py [--res 512 --batch 1]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from onedc_tpu.models.dmd import SDGuidance
from onedc_tpu.models.onedc import OneDC
from onedc_tpu.train.trainer_stage2 import (
    create_stage2_states,
    make_generator_step,
    make_guidance_step,
)


def to_bf16_under(tree, subs):
    """Cast f32 params under the named top-level submodules to bf16
    (frozen weights: real_unet / vae / codec)."""
    def cast(sub):
        # one jitted program, not one astype dispatch per leaf
        return jax.jit(lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t))(sub)
    p = dict(tree["params"])
    for s in subs:
        if s in p:
            p[s] = cast(p[s])
    return {"params": p}


def hbm_stats(tag):
    try:
        ms = jax.devices()[0].memory_stats()
        peak = ms.get("peak_bytes_in_use", 0) / 2**30
        now = ms.get("bytes_in_use", 0) / 2**30
        print(f"[{tag}] HBM in_use={now:.2f} GiB peak={peak:.2f} GiB")
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    onedc = OneDC()            # flagship
    guidance = SDGuidance()    # full SD1.5 pair
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    onedc_params = jax.jit(lambda x: onedc.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    lat0 = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ctx0 = jnp.zeros((1, 77, 768), jnp.float32)
    guid_params = jax.jit(lambda l, t, u: guidance.init(
        {"params": key}, l, t, u, jax.random.PRNGKey(1),
        method=guidance.generator_forward))(lat0, ctx0, ctx0)
    print(f"init {time.perf_counter() - t0:.1f}s")

    n_onedc = sum(x.size for x in jax.tree_util.tree_leaves(onedc_params))
    n_guid = sum(x.size for x in jax.tree_util.tree_leaves(guid_params))
    print(f"params: onedc {n_onedc/1e9:.2f}B + guidance {n_guid/1e9:.2f}B")

    # frozen submodules in bf16 (ref keeps real_unet bf16)
    onedc_params = to_bf16_under(onedc_params, ("vae", "codec"))
    guid_params = to_bf16_under(guid_params, ("real_unet",))
    hbm_stats("after params")

    gen_state, guid_state = create_stage2_states(
        onedc, onedc_params, guidance, guid_params, optimizer="adafactor")
    del onedc_params, guid_params
    hbm_stats("after optimizer states")

    gen_step = jax.jit(make_generator_step(onedc, guidance, remat=True),
                       donate_argnums=(0,))
    guid_step = jax.jit(make_guidance_step(guidance, remat=True),
                        donate_argnums=(0,))

    b, r = args.batch, args.res
    img = jax.random.uniform(jax.random.PRNGKey(2), (b, r, r, 3),
                             minval=-1, maxval=1)
    text = jax.random.normal(jax.random.PRNGKey(3), (b, 77, 768)) * 0.2
    uncond = jax.random.normal(jax.random.PRNGKey(4), (b, 77, 768)) * 0.2

    # generator turn
    t0 = time.perf_counter()
    gen_state, gmet, aux = gen_step(gen_state, guid_state.params,
                                    {"image": img}, text, uncond,
                                    jax.random.PRNGKey(5))
    jax.block_until_ready(gmet["gen_total"])
    print(f"gen turn compile+1 {time.perf_counter() - t0:.1f}s "
          f"(loss={float(gmet['gen_total']):.4f})")
    hbm_stats("after gen turn")

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        gen_state, gmet, aux = gen_step(gen_state, guid_state.params,
                                        {"image": img}, text, uncond,
                                        jax.random.fold_in(key, i))
    jax.block_until_ready(gmet["gen_total"])
    t_gen = (time.perf_counter() - t0) / reps
    print(f"GEN turn: {t_gen:.3f} s/step (batch {b}, {r}px)")

    # guidance turn
    t0 = time.perf_counter()
    guid_state, qmet = guid_step(guid_state, aux["fake_latents"],
                                 aux["real_latents"], text, uncond,
                                 jax.random.PRNGKey(6))
    jax.block_until_ready(qmet["guid_total"])
    print(f"guid turn compile+1 {time.perf_counter() - t0:.1f}s "
          f"(loss={float(qmet['guid_total']):.4f})")
    t0 = time.perf_counter()
    for i in range(reps):
        guid_state, qmet = guid_step(guid_state, aux["fake_latents"],
                                     aux["real_latents"], text, uncond,
                                     jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(qmet["guid_total"])
    t_guid = (time.perf_counter() - t0) / reps
    print(f"GUID turn: {t_guid:.3f} s/step (batch {b}, {r}px)")
    hbm_stats("after guid turn")

    # effective step time at the reference cadence (gen every 10th step)
    print(f"effective: {t_guid + t_gen / 10:.3f} s/step at "
          f"dfake_gen_update_ratio=10; full two-turn {t_gen + t_guid:.3f} s")
    assert np.isfinite(float(gmet["gen_total"]))
    assert np.isfinite(float(qmet["guid_total"]))


if __name__ == "__main__":
    main()
