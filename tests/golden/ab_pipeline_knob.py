"""Same-session A/B of one serving-pipeline env knob (generalizes
ab_symbol_i8.py).

The pipelined λ decode exposes its schedule knobs as env vars
(serving/pipeline.py: ONEDC_PIPELINE_CHUNK / ONEDC_PIPELINE_DEPTH /
ONEDC_VAE_CHUNK / ONEDC_SYMBOL_I8). Each measurement runs in its OWN
subprocess (two compiled program sets in one process fragment the
16 GiB HBM pool — same reason bench.py isolates stages), alternating
A/B values so the shared tunnel's ±10-20% load drift cancels; compare
the MEDIANS, not single reps.

    PYTHONPATH=/root/repo:/root/.axon_site python \
        tests/golden/ab_pipeline_knob.py ONEDC_VAE_CHUNK 8 4
"""

import json
import os
import subprocess
import sys
import time

SIZE = 768
N_STREAMS = 48
ROUNDS = 3  # alternating subprocess pairs


def run_one(var: str, value: str) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from onedc_tpu.models.onedc import OneDC, OneDCRuntime
    from onedc_tpu.utils.calibrate import (
        calibrate_stream_params,
        pick_stream_scale,
    )

    os.environ[var] = value

    def to_bf16(tree):
        # one jitted program, not one astype dispatch per leaf
        return jax.jit(lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t))(tree)

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
    return {var: value, "bpp_y": bpp, "decodes_per_sec": vals}


def main():
    if sys.argv[1] == "--one":
        print(json.dumps(run_one(sys.argv[2], sys.argv[3])))
        return

    var, a, b = sys.argv[1], sys.argv[2], sys.argv[3]
    results = {a: [], b: []}
    for rnd in range(ROUNDS):
        for value in (a, b):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", var, value],
                capture_output=True, text=True, timeout=3000,
                cwd="/root/repo")
            if r.returncode != 0 or not r.stdout.strip():
                raise RuntimeError(
                    f"subprocess failed rc={r.returncode}:\n"
                    + "\n".join((r.stderr or "").splitlines()[-10:]))
            line = r.stdout.strip().splitlines()[-1]
            d = json.loads(line)
            results[value].extend(d["decodes_per_sec"])
            print(f"round {rnd} {var}={value}: "
                  + ", ".join(f"{v:.3f}" for v in d["decodes_per_sec"]),
                  flush=True)
    for value in (a, b):
        vs = sorted(results[value])
        med = vs[len(vs) // 2]
        print(f"{var}={value}: median {med:.3f} decodes/s  (all: "
              + ", ".join(f"{v:.2f}" for v in vs) + ")")


if __name__ == "__main__":
    main()
