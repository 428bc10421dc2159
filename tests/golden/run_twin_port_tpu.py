"""Kodak-size end-to-end twin-checkpoint port + decode on the real chip.

Builds the FULL-layout model.safetensors / model_1.safetensors twins
(tests/twins.py), ports them with ``port_onedc_checkpoint``
(require_complete on unet+codec), and runs a real 768x512 (Kodak-size)
bitstream encode -> decode on the flagship model in bf16 — the measured
counterpart of tests/test_twin_checkpoints.py (VERDICT round-2 item 2).

    PYTHONPATH=/root/repo:/root/repo/tests python tests/golden/run_twin_port_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from onedc_tpu.models.onedc import OneDC, OneDCRuntime
from onedc_tpu.utils.port_torch import port_onedc_checkpoint

from twins import codec_twin, sd_unet_twin


def main():
    model = OneDC(compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    print(f"init {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    ported = port_onedc_checkpoint(
        unet_path=sd_unet_twin(), codec_path=codec_twin(),
        reference_params=params, require_complete=("unet", "codec"))
    print(f"port (full twins, complete coverage) {time.perf_counter() - t0:.1f}s")

    rt = OneDCRuntime(model, ported, dtype=jnp.bfloat16)
    rt.update(force=True)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 768, 3),
                             minval=-1, maxval=1)
    t0 = time.perf_counter()
    stream, bpp = rt.encode(img, fp="/tmp/twin_kodak.bin")
    print(f"encode 768x512 {time.perf_counter() - t0:.1f}s  "
          f"bpp={bpp['bpp']:.4f} bytes={len(stream)}")
    t0 = time.perf_counter()
    out = rt.decode(fp="/tmp/twin_kodak.bin")
    out = np.asarray(out)
    print(f"decode 768x512 {time.perf_counter() - t0:.1f}s  "
          f"shape={out.shape} finite={np.all(np.isfinite(out))} "
          f"range=[{out.min():.3f},{out.max():.3f}]")
    assert out.shape == (1, 512, 768, 3) and np.all(np.isfinite(out))
    print("twin port end-to-end OK")


if __name__ == "__main__":
    main()
