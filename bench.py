"""Headline benchmark: 768x768 one-step decodes per second per chip.

The HEADLINE is the lambda-family full decode — the path the reference
actually ships (src/inference.py:96-135): real bitstream in, host rANS +
the FOUR host<->device round trips of the four-part prior (SURVEY.md
section 3.2's serial hot loop) + one-step UNet + VAE, software-pipelined
across a stream of images (decode_batch). Extra keys report the single-
stream lambda decode, the z-only device path (the old headline — an
upper bound with no host work), and the TinyVAE decode variant.

All paths are full-flagship bf16 on one chip. Prints exactly one JSON
line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Each stage runs in its OWN subprocess: the stages allocate multi-GB
activation sets at different shapes, and on this 16 GiB chip whichever
big-memory stage runs later in a shared process hits allocator
fragmentation and loses 2-3x throughput (measured both orderings:
lambda 11.2 -> 3.5/s or batched z-only 15.4 -> 3.7/s depending on who
goes second). Process isolation gives every stage a clean HBM pool;
the persistent compile cache keeps the per-process startup modest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
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
    # one jitted program, not one astype dispatch per leaf (~10^3 leaves
    # x ~ms of tunnel RPC each adds minutes of pure dispatch)
    return jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t))(tree)


def _flagship():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from onedc_tpu.models.onedc import OneDC

    # compute_dtype pins the whole decode pipeline to bf16: without it
    # the f32 FSQ codes/x0 promote every downstream conv to f32
    model = OneDC(compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    # init on a small spatial size (params are size-independent), then
    # run the decode path at the benchmark size
    img_small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img_small)
    return model, to_bf16(params)


def stage_lambda():
    """Headline: lambda-family full decode on CALIBRATED bitstreams.

    Random-init weights emit ~9.5 bpp streams (mostly bypass escapes) —
    ~100x the released lambda-family's 0.02-0.11 bpp band — so the host
    rANS is timed on an unrealistic symbol volume (VERDICT r3 weak item
    1). calibrate_stream_params shrinks the y-path output heads until
    measured bpp lands in the realistic band; the uncalibrated number is
    kept as a secondary key so the old conservative measurement stays
    visible."""
    import jax.numpy as jnp

    from onedc_tpu.models.onedc import OneDCRuntime
    from onedc_tpu.utils.calibrate import (
        calibrate_stream_params,
        pick_stream_scale,
    )

    model, params = _flagship()
    rt = OneDCRuntime(model, params)
    rt.update(force=True)

    probe = jax.random.uniform(jax.random.PRNGKey(11), (1, SIZE, SIZE, 3),
                               minval=-1, maxval=1)

    def bpp_at(s):
        rt.set_params(calibrate_stream_params(params, s))
        _, b = rt.encode(probe)
        return b["bpp_y"]

    scale, bpp = pick_stream_scale(bpp_at)
    rt.set_params(calibrate_stream_params(params, scale))
    res = bench_lambda_decode(rt)
    res["lambda_calib_scale"] = scale

    # uncalibrated (random-init ~9.5 bpp) reference numbers: the
    # host-rANS-saturated regime, for cross-round A/Bs against rounds
    # 1-3. SAME 48-stream count as the calibrated headline (VERDICT r4
    # weak item 2: a 16-stream run inflates fill/drain and the two
    # protocols stop being comparable).
    rt.set_params(params)
    uncal = bench_lambda_decode(rt, n_streams=48, n_single=2)
    res["lambda_uncalib_batch_decodes_per_sec"] = \
        uncal["lambda_batch_decodes_per_sec"]
    res["lambda_uncalib_stream_bpp_mean"] = uncal["lambda_stream_bpp_mean"]
    return res


def stage_zonly():
    model, params = _flagship()
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
    return {"zonly_decodes_per_sec": round(ITERS / dt, 3)}


def stage_zonly_batch8():
    model, params = _flagship()
    return {"zonly_batch8_decodes_per_sec":
            _bench_batched_z(model, params)}


def stage_tinyvae():
    return {"tinyvae_batch8_decodes_per_sec": bench_tinyvae()}


def stage_lambda_tinyvae():
    """Full lambda-family pipelined decode through the productized
    TinyVAE serving mode (``OneDCRuntime(vae="tiny")`` — the reference's
    use_large_vae=False flag, model_..._stage1.py:39-54): same CALIBRATED
    bitstreams and pipelined path as the headline, ~45 ms of large-VAE
    decode dropped. Reports throughput + its own device floor + a
    PSNR/MS-SSIM proxy vs the large-VAE decode of the SAME stream
    (random-init twin decoders — a relative-structure proxy only; the
    true delta needs real taesd/SD-VAE weights, BASELINE.md gate)."""
    import numpy as np

    from onedc_tpu.eval.metrics import ms_ssim
    from onedc_tpu.models.onedc import OneDCRuntime, ensure_tiny_vae_params
    from onedc_tpu.utils.calibrate import (
        calibrate_stream_params,
        pick_stream_scale,
    )

    model, params = _flagship()
    # to_bf16 again: the grafted tiny-decoder subtree inits f32 and an
    # f32 kernel would silently promote the whole TinyVAE stage
    params = to_bf16(ensure_tiny_vae_params(model, params))
    rtt = OneDCRuntime(model, params, vae="tiny")
    rtt.update(force=True)

    probe = jax.random.uniform(jax.random.PRNGKey(11), (1, SIZE, SIZE, 3),
                               minval=-1, maxval=1)

    def bpp_at(s):
        rtt.set_params(calibrate_stream_params(params, s))
        _, b = rtt.encode(probe)
        return b["bpp_y"]

    scale, _ = pick_stream_scale(bpp_at)
    cal = calibrate_stream_params(params, scale)
    rtt.set_params(cal)
    res = bench_lambda_decode(rtt)
    out = {k.replace("lambda_", "lambda_tinyvae_", 1): v
           for k, v in res.items()}

    # same-stream quality proxy vs the large VAE (like w8a8's PSNR key):
    # identical bitstream, identical codec+UNet stages — only the final
    # VAE decode differs, so the delta isolates the TinyVAE swap
    rtl = OneDCRuntime(model, cal, vae="large")
    rtl.update(force=True)
    s, _ = rtt.encode(probe)
    img_tiny = np.asarray(rtt.decode(stream=bytes(s)), np.float32)
    img_large = np.asarray(rtl.decode(stream=bytes(s)), np.float32)
    mse = float(np.mean((img_tiny - img_large) ** 2))
    out["lambda_tinyvae_psnr_vs_large_db"] = round(
        10 * float(np.log10(4.0 / max(mse, 1e-12))), 2)
    # ms_ssim returns per-image values, shape (B,)
    out["lambda_tinyvae_msssim_vs_large"] = round(float(np.mean(
        np.asarray(ms_ssim(img_tiny * 0.5 + 0.5, img_large * 0.5 + 0.5,
                           data_range=1.0)))), 4)
    return out


def stage_lambda_w8a8():
    """Opt-in w8a8 serving decode (nn/quant.py): the UNet/VAE convs run
    int8 on the MXU (measured 1.24-1.44x the bf16 rate at these conv
    shapes — tests/golden/probe_int8.py). Same calibrated bitstreams
    and pipelined path as the headline stage; reports throughput, its
    own device floor, and a PSNR-vs-exact-bf16 proxy. A lossy serving
    MODE like TinyVAE — never the headline (the real-weight quality
    gate, BASELINE.md:29-31, is still open)."""
    import numpy as np

    from onedc_tpu.models.onedc import OneDCRuntime
    from onedc_tpu.utils.calibrate import (
        calibrate_stream_params,
        pick_stream_scale,
    )

    model, params = _flagship()
    rtq = OneDCRuntime(model, params, quant="w8a8")
    rtq.update(force=True)

    probe = jax.random.uniform(jax.random.PRNGKey(11), (1, SIZE, SIZE, 3),
                               minval=-1, maxval=1)

    def bpp_at(s):
        # encode is exact in w8a8 mode, so calibrating through the
        # quantized runtime picks the same scale as the headline stage
        rtq.set_params(calibrate_stream_params(params, s))
        _, b = rtq.encode(probe)
        return b["bpp_y"]

    scale, _ = pick_stream_scale(bpp_at)
    cal = calibrate_stream_params(params, scale)
    rtq.set_params(cal)
    res = bench_lambda_decode(rtq)
    out = {k.replace("lambda_", "lambda_w8a8_", 1): v for k, v in res.items()}

    # quality proxy on one stream: decode it exactly and quantized.
    # Random-init activations are quantization-hostile (no trained
    # structure), so this is a conservative lower bound on real-weight
    # w8a8 quality.
    rt = OneDCRuntime(model, cal)
    rt.update(force=True)
    s, _ = rtq.encode(probe)
    img_exact = np.asarray(rt.decode(stream=bytes(s)), np.float32)
    img_q = np.asarray(rtq.decode(stream=bytes(s)), np.float32)
    mse = float(np.mean((img_exact - img_q) ** 2))
    out["lambda_w8a8_psnr_vs_bf16_db"] = round(
        10 * float(np.log10(4.0 / max(mse, 1e-12))), 2)
    return out


def stage_ceiling():
    return bench_chip_ceiling()


STAGES = {
    "lambda": stage_lambda,
    "zonly": stage_zonly,
    "zonly_batch8": stage_zonly_batch8,
    "tinyvae": stage_tinyvae,
    "lambda_tinyvae": stage_lambda_tinyvae,
    "lambda_w8a8": stage_lambda_w8a8,
    "ceiling": stage_ceiling,
}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        # persistent compile cache for EVERY stage subprocess (stages
        # that build their own model, e.g. tinyvae, would otherwise
        # cold-compile the 768px program each bench run)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        print(json.dumps(STAGES[sys.argv[2]]()))
        return

    extra = {}
    for name in STAGES:
        r = None
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            extra.update(json.loads(r.stdout.strip().splitlines()[-1]))
        except Exception as e:
            # surface the stage's real failure, not the JSON parse error
            detail = str(e)
            if r is not None and (r.returncode != 0 or not r.stdout.strip()):
                tail = " | ".join((r.stderr or "").strip().splitlines()[-3:])
                detail = f"rc={r.returncode}: {tail}" if tail else detail
            extra[f"{name}_bench_error"] = detail[:300]

    # headline = the product path (lambda batched); fall back to the
    # device path only if the lambda bench failed outright
    lam_batch = extra.get("lambda_batch_decodes_per_sec")
    headline = (lam_batch if lam_batch is not None
                else extra.get("zonly_decodes_per_sec", 0.0))
    # probe-normalized headline (VERDICT r3 item 6): decodes/s per
    # measured chip TF/s and per GB/s, so cross-round comparisons survive
    # a drifting/throttled tunnel chip
    tf = extra.get("chip_bf16_matmul_tf_per_s")
    hbm = extra.get("chip_hbm_gb_per_s")
    if headline and tf:
        extra["value_per_probe_tf"] = round(headline / tf, 5)
    if headline and hbm:
        extra["value_per_probe_hbm_gbps"] = round(headline / hbm, 5)

    floor_ms = extra.get("lambda_device_floor_ms_per_img")
    if headline and tf and hbm and floor_ms:
        extra.update(projection_keys(headline, tf, hbm, floor_ms))

    metric = (f"{SIZE}x{SIZE} lambda-family full decodes/sec/chip "
              f"(bf16, bitstream->image, pipelined batch)")
    print(json.dumps({
        "metric": metric,
        "value": round(headline, 3),
        "unit": "decodes/s",
        "vs_baseline": round(headline / BASELINE_DECODES_PER_SEC, 3),
        **extra,
    }))


REF_TF, REF_HBM = 100.0, 241.0     # healthiest measured tunnel session
SPEC_TF, SPEC_HBM = 197.0, 819.0   # TPU v5e datasheet


def projection_keys(headline: float, tf: float, hbm: float,
                    floor_ms: float) -> dict:
    """Probe-scaled throughput projections (VERDICT r3 next-step 1's
    alternate 'done' criterion: quantify how much of the gap to 20/s is
    the measuring session's degraded chip).

    Model: the decode stages are measured COMPUTE-bound on degraded
    sessions (profile_lambda_decode.py: UNet at ~104% of the
    same-session chained-matmul probe, VAE at ~150% — convs beat the
    probe), so the device floor scales with the probe ratio; the
    host/pipeline exposure (1/throughput - floor) is held CONSTANT,
    which is conservative: on a local chip the tunnel-RPC share of the
    exposure also disappears. Two reference points: the healthiest
    session this code has measured (rounds 2-3: 88-107 TF/s,
    227-235 GB/s) and the v5e datasheet (the tunnel chip has never
    probed above ~54% of spec MXU, so the 20/s target's natural
    habitat — a non-throttled v5e — is only reachable by projection).
    Each projection takes the LESS optimistic of the MXU and HBM
    scalings. The reference point self-refreshes (VERDICT r4 weak item
    1): when THIS session probes above the recorded healthiest
    constants, the session's own probes become the reference, so the
    'healthy' projection can never read below the measured number."""
    t_meas = 1e3 / headline                      # ms/img incl. host
    exposure = max(t_meas - floor_ms, 0.0)
    ref_tf, ref_hbm = max(REF_TF, tf), max(REF_HBM, hbm)
    scale = max(tf / ref_tf, hbm / ref_hbm)
    spec_scale = max(tf / SPEC_TF, hbm / SPEC_HBM)
    return {
        "lambda_projected_healthy_decodes_per_sec": round(
            1e3 / (floor_ms * scale + exposure), 2),
        "lambda_projected_spec_v5e_decodes_per_sec": round(
            1e3 / (floor_ms * spec_scale + exposure), 2),
        "lambda_projection_ref_probes": [ref_tf, ref_hbm],
        "lambda_pipeline_exposure_ms_per_img": round(exposure, 2),
    }


def bench_chip_ceiling():
    """Measured ceilings of THIS chip, for normalizing the headline:
    bf16 matmul TF/s (v5e spec 197) and effective HBM GB/s (spec 819).
    Measured here: MXU near-spec but HBM ~6x below spec through the
    tunnel — the 768px decode is bandwidth-bound on this chip (bare
    300 MB elementwise pass: ~2.5 ms), so decodes/s scales with real
    HBM bandwidth, not with more MXU work."""
    n = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    def chain(a, b):
        x = a
        for _ in range(8):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return jnp.float32(jnp.sum(x))

    f = jax.jit(chain)
    float(f(a, b))
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        r = f(a, b)
    float(r)
    dt = (time.perf_counter() - t0) / (reps * 8)
    tf = 2 * n ** 3 / dt / 1e12

    # bandwidth: chained whole-tensor passes over a 151 MB bf16 buffer
    big = jax.random.normal(jax.random.PRNGKey(2), (768, 768, 128),
                            jnp.bfloat16)

    def passes(x):
        for _ in range(8):
            # barrier: stop XLA fusing the chain into one pass
            x = jax.lax.optimization_barrier(x + jnp.bfloat16(1.0))
        return jnp.float32(jnp.sum(x))

    g = jax.jit(passes)
    float(g(big))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = g(big)
    float(r)
    dtp = (time.perf_counter() - t0) / (reps * 8)
    gbs = 2 * big.size * 2 / dtp / 1e9  # read+write per pass
    return {"chip_bf16_matmul_tf_per_s": round(tf, 1),
            "chip_hbm_gb_per_s": round(gbs, 1)}


def _bench_batched_z(model, params, batch: int = 8, reps: int = 6):
    """Batched z-only device decode: ONE program at B=batch, per-image
    time from reps repeated executions (distinct dispatches, one fetch).
    B=8 amortizes dispatch + weight reads: 62 ms/img vs 87 at B=1
    (measured round 3 — the round-2 'batching regresses' result was the
    GroupNorm batch-NaN masking as memory pressure)."""
    zh = zw = SIZE // 64
    dec = jax.jit(lambda p, zi: model.apply(
        p, zi, method=model.decode_device_z_only))
    zs = jax.random.randint(jax.random.PRNGKey(3), (batch, zh, zw), 0, 16384)
    out = dec(params, zs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = dec(params, zs)
    jax.block_until_ready(out)
    assert bool(jnp.all(jnp.isfinite(out))), "batched z-only decode NaN"
    return round(reps * batch / (time.perf_counter() - t0), 3)


def bench_tinyvae():
    """Batched z-only decode with the taesd TinyVAE decode path
    (use_large_vae=False; ROADMAP item 4 — drops the large-VAE stage)."""
    from onedc_tpu.models.onedc import OneDC

    model = OneDC(compute_dtype=jnp.bfloat16, use_large_vae=False)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    return _bench_batched_z(model, to_bf16(params))


def bench_lambda_decode(rt, n_streams: int = 48, n_single: int = 8):
    """Full lambda-family decode: bitstream -> image, timing the host rANS
    + 4 prior round trips + device NN (VERDICT round-1 weak item 2).

    The batched number is STEADY-STATE serving throughput: 48 streams
    through the software pipeline (chunks sized to amortize pipeline
    fill/drain; 16 streams under-reports by ~15%). Mean bpp is reported
    so the symbol load behind the host-rANS cost is visible."""
    import numpy as np

    key = jax.random.PRNGKey(7)
    imgs = [jax.random.uniform(jax.random.fold_in(key, i),
                               (1, SIZE, SIZE, 3), minval=-1, maxval=1)
            for i in range(n_streams)]
    rt.encode_many(imgs[:8])  # compile the batched encode before timing
    t0 = time.perf_counter()
    enc = rt.encode_many(imgs)
    streams = [bytes(s) for s, _ in enc]
    bpps = [b["bpp"] for _, b in enc]
    enc_per_sec = n_streams / (time.perf_counter() - t0)

    # warm both compiled paths; assert finite output (a NaN decode must
    # fail the bench, not silently post a throughput number)
    single = rt.decode(stream=streams[0])
    assert bool(jnp.all(jnp.isfinite(single))), "single decode NaN"
    out = rt.decode_batch(streams[:16])
    jax.block_until_ready(out[0])
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out), \
        "batched decode NaN"

    t0 = time.perf_counter()
    for s in streams[:n_single]:
        jax.block_until_ready(rt.decode(stream=s))
    t_single = (time.perf_counter() - t0) / n_single

    # median of 3 reps: the shared tunnel host's load noise is +-10%
    # run to run; a single rep under- or over-reports steady-state
    # serving throughput
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = rt.decode_batch(streams)
        jax.block_until_ready(outs[0])
        ts.append((time.perf_counter() - t0) / n_streams)
    t_batch = sorted(ts)[1]

    res = {
        "lambda_decodes_per_sec": round(1.0 / t_single, 3),
        "lambda_batch_decodes_per_sec": round(1.0 / t_batch, 3),
        "lambda_batch_n_streams": n_streams,
        "lambda_stream_bpp_mean": round(float(np.mean(bpps)), 4),
        "lambda_batch_encodes_per_sec": round(enc_per_sec, 3),
    }
    res.update(_lambda_device_floor(rt))
    return res


def _lambda_device_floor(rt, batch: int = 8, reps: int = 4):
    """Pure device-work floor of the pipelined chunk (begin + 4 updates +
    x0 + VAE at B=batch, synthetic inputs, programs already compiled by
    the main run): the ceiling the host pipeline is hiding toward, and
    the per-stage split the next optimization round needs. Exposure =
    1/throughput - floor."""
    crt = rt._codec_rt
    zh = zw = SIZE // 64

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, out

    zi = jax.random.randint(jax.random.PRNGKey(5), (batch, zh, zw), 0, 16384)
    t_begin, st = timeit(lambda: crt._begin(crt.params, zi))
    # int8 symbols: the dtype the calibrated serving path actually ships
    # (serving/pipeline._narrow_symbols), so the floor times the same
    # compiled update programs as the headline
    yqr = jnp.zeros(st["indexes_r"].shape, jnp.int8)
    t_up = 0.0
    nxt = {"means": st["means"], "y_hat": st["y_hat"]}
    for s in range(4):
        t, nxt = timeit(lambda s=s, n=nxt: crt._update[s](
            crt.params, yqr, n["means"], n["y_hat"], st["common"]))
        t_up += t
    t_x0, x0 = timeit(lambda: rt._decode_x0(rt.params, nxt["y_hat"],
                                            st["z_semantic"]))
    t_vae, _ = timeit(lambda: rt._decode_vae(rt.params, x0))
    floor = (t_begin + t_up + t_x0 + t_vae) / batch
    return {
        "lambda_device_floor_ms_per_img": round(floor * 1e3, 2),
        "lambda_device_ceiling_per_sec": round(1.0 / floor, 2),
        "lambda_stage_ms_begin": round(t_begin * 1e3, 2),
        "lambda_stage_ms_updates": round(t_up * 1e3, 2),
        "lambda_stage_ms_x0": round(t_x0 * 1e3, 2),
        "lambda_stage_ms_vae": round(t_vae * 1e3, 2),
    }


if __name__ == "__main__":
    main()
