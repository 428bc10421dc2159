"""Same-session A/B of the int8 symbol upload (VERDICT r4 next-step 1c).

Calibrated lambda-family streams decode to symbols in {0,+-1,+-2}, but
the serving pipeline shipped them to the device as int16 (the native
coder's dtype). ``serving/pipeline._narrow_symbols`` now ships int8 when
the chunk fits and the worker thread issues the device_put (so the
transfer overlaps other chunks' host work).

Each measurement runs in its OWN subprocess (both modes in one process
OOM the 16 GiB chip — allocator fragmentation across the two compiled
program sets; same reason bench.py isolates stages), alternating
int16/int8 so the tunnel's +-10% load drift cancels:

    PYTHONPATH=/root/repo:/root/.axon_site python tests/golden/ab_symbol_i8.py
"""

import json
import os
import subprocess
import sys
import time

SIZE = 768
N_STREAMS = 48
ROUNDS = 3  # alternating subprocess pairs


def run_one(flag: str) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from onedc_tpu.models.onedc import OneDC, OneDCRuntime
    from onedc_tpu.utils.calibrate import (
        calibrate_stream_params,
        pick_stream_scale,
    )

    os.environ["ONEDC_SYMBOL_I8"] = flag

    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    model = OneDC(compute_dtype=jnp.bfloat16)
    params = jax.jit(
        lambda x: model.init({"params": jax.random.PRNGKey(0)}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    rt = OneDCRuntime(model, to_bf16(params))
    rt.update(force=True)

    probe = jax.random.uniform(jax.random.PRNGKey(11), (1, SIZE, SIZE, 3),
                               minval=-1, maxval=1)

    def bpp_at(s):
        rt.set_params(calibrate_stream_params(params, s))
        _, b = rt.encode(probe)
        return b["bpp_y"]

    scale, bpp = pick_stream_scale(bpp_at)
    rt.set_params(calibrate_stream_params(params, scale))

    imgs = [jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(7), i),
                               (1, SIZE, SIZE, 3), minval=-1, maxval=1)
            for i in range(N_STREAMS)]
    streams = [bytes(s) for s, _ in rt.encode_many(imgs)]

    out = rt.decode_batch(streams[:16])  # warm/compile
    jax.block_until_ready(out[0])

    vals = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = rt.decode_batch(streams)
        jax.block_until_ready(outs[0])
        vals.append(N_STREAMS / (time.perf_counter() - t0))
    return {"flag": flag, "bpp_y": bpp, "decodes_per_sec": vals}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--flag":
        print(json.dumps(run_one(sys.argv[2])))
        return

    results = {"0": [], "1": []}
    for rnd in range(ROUNDS):
        for flag in ("0", "1"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flag", flag],
                capture_output=True, text=True, timeout=3000,
                cwd="/root/repo")
            line = r.stdout.strip().splitlines()[-1]
            d = json.loads(line)
            results[flag].extend(d["decodes_per_sec"])
            print(f"round {rnd} i8={flag}: "
                  + ", ".join(f"{v:.3f}" for v in d["decodes_per_sec"]),
                  flush=True)
    for flag, label in (("0", "int16 baseline"), ("1", "int8 narrowed")):
        vs = sorted(results[flag])
        med = vs[len(vs) // 2]
        print(f"{label}: median {med:.3f} decodes/s  (all: "
              + ", ".join(f"{v:.2f}" for v in vs) + ")")


if __name__ == "__main__":
    main()
