"""w8a8 quantized serving decode (nn/quant.py).

The mode must (a) actually run int8 on the conv/dense ops of the
quality stages, (b) stay within quantization-noise distance of the
exact bf16 decode, (c) leave the entropy path bit-exact — a stream
encoded by a quantized runtime decodes identically on an exact one —
and (d) ride through the AOT serving export.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import onedc_tpu.nn.quant as quant
from onedc_tpu.models.onedc import OneDC, OneDCRuntime
from onedc_tpu.nn.quant import _quantize, w8a8_methods


@pytest.fixture(autouse=True)
def _q8_all_channels(monkeypatch):
    """The tiny test configs (32-64 ch) sit below the production
    roofline gate (_Q8_MIN_CH), which would silently turn every test
    into exact bf16; drop the gate so the int8 path is exercised."""
    monkeypatch.setattr(quant, "_Q8_MIN_CH", 0)

TINY = dict(
    internal_ch=64, bottleneck_ch=32, unet_ch_config=(32, 64, 64),
    ctrl_ch=32, sd_block_channels=(32, 32, 64, 64), context_dim=64,
    vae_block_channels=(32, 32, 64, 64), vae_attn_patch=4,
)


def _tiny_runtimes():
    model = OneDC(compute_dtype=jnp.bfloat16, **TINY)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda x: model.init({"params": key}, x))(
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    rt = OneDCRuntime(model, params, dtype=jnp.bfloat16)
    rt.update(force=True)
    rtq = OneDCRuntime(model, params, dtype=jnp.bfloat16, quant="w8a8")
    rtq.update(force=True)
    return model, rt, rtq


@pytest.fixture(scope="module")
def tiny_rts():
    """Shared exact/quantized runtime pair. Module-scoped: each runtime
    carries its own jitted program set, which dominates wall time on
    the 1-core CPU oracle. Tests that MUTATE a runtime's programs
    (enable_spatial_decode) build their own via _tiny_runtimes()."""
    return _tiny_runtimes()


def test_quantize_roundtrip_error_bound():
    # symmetric int8: |x - q*s| <= s/2 elementwise, s = amax/127
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 64), jnp.float32)
    q, s = _quantize(x)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert np.all(err <= float(np.asarray(s)) / 2 + 1e-7)
    assert q.dtype == jnp.int8
    # per-channel weight mode
    q2, s2 = _quantize(x, axes=(0,))
    assert s2.shape == (1, 64)
    err2 = np.abs(np.asarray(q2, np.float32) * np.asarray(s2)
                  - np.asarray(x))
    assert np.all(err2 <= np.asarray(s2) / 2 + 1e-7)


def test_conv_w8a8_matches_exact_within_quant_noise():
    """A single intercepted nn.Conv: the int8 result must track the f32
    conv within the analytic quant-noise bound (relative ~1/127 per
    operand)."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(32, (3, 3), padding=1, name="c")(x)

    m = M()
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 16), jnp.float32)
    p = m.init(jax.random.fold_in(key, 1), x)
    want = m.apply(p, x)

    import onedc_tpu.nn.quant as quant
    orig = quant.QUANT_PREFIXES
    quant.QUANT_PREFIXES = ((),)  # match everything for this test
    try:
        with w8a8_methods():
            got = m.apply(p, x)
    finally:
        quant.QUANT_PREFIXES = orig
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = float(np.abs(np.asarray(want)).max())
    assert err.max() <= 0.05 * scale, (err.max(), scale)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())
    assert corr[0, 1] > 0.999


def test_w8a8_batch_invariance():
    """Per-image (conv) / per-token (dense) activation scales make the
    int8 path independent of batch companions: an image decoded inside
    a batch must equal its B=1 decode bit-for-bit in the int8 convs
    (integer accumulation is exact), so outputs match to bf16 noise.
    Per-batch-tensor scales violated this by >10 dB (measured)."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(32, (3, 3), padding=1, name="c")(x)
            return nn.Dense(16, name="d")(h)

    m = M()
    key = jax.random.PRNGKey(4)
    # second sample has 100x the amplitude: under whole-batch scales it
    # would crush sample 0's quantization resolution
    x = jax.random.normal(key, (2, 8, 8, 16), jnp.float32)
    x = x.at[1].mul(100.0)
    p = m.init(jax.random.fold_in(key, 1), x)

    import onedc_tpu.nn.quant as quant
    orig = quant.QUANT_PREFIXES
    quant.QUANT_PREFIXES = ((),)
    try:
        with w8a8_methods():
            got_b2 = m.apply(p, x)
            got_b1 = m.apply(p, x[:1])
    finally:
        quant.QUANT_PREFIXES = orig
    np.testing.assert_allclose(np.asarray(got_b2[:1]), np.asarray(got_b1),
                               rtol=1e-6, atol=1e-6)


def test_w8a8_decode_close_and_int8_in_program(tiny_rts):
    model, rt, rtq = tiny_rts
    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    s, _ = rt.encode(img)
    out = np.asarray(rt.decode(stream=bytes(s)), np.float32)
    outq = np.asarray(rtq.decode(stream=bytes(s)), np.float32)
    assert out.shape == outq.shape
    mse = float(np.mean((out - outq) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    # measured ~36 dB on random-init weights; 25 leaves headroom for
    # platform rounding differences while still catching real breakage
    assert psnr > 25.0, psnr
    assert np.corrcoef(out.ravel(), outq.ravel())[0, 1] > 0.99

    txt = rtq._decode_vae.lower(
        rtq.params,
        jnp.zeros((1, 8, 8, model.vae_ch), jnp.bfloat16)).as_text()
    assert "i8" in txt and "i32" in txt  # int8 operands, int32 accum
    # the exact runtime's program must NOT contain int8 compute
    txt_exact = rt._decode_vae.lower(
        rtq.params,
        jnp.zeros((1, 8, 8, model.vae_ch), jnp.bfloat16)).as_text()
    assert "xi8" not in txt_exact


def test_w8a8_encode_is_exact(tiny_rts):
    """Streams from a quantized runtime are byte-identical to the exact
    runtime's: encode and the entropy path never quantize."""
    _, rt, rtq = tiny_rts
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3),
                             minval=-1, maxval=1)
    s_exact, bpp_exact = rt.encode(img)
    s_q, bpp_q = rtq.encode(img)
    assert bytes(s_exact) == bytes(s_q)
    assert bpp_exact["bpp"] == bpp_q["bpp"]


def test_w8a8_aot_export_carries_quant(tmp_path, tiny_rts):
    """export_decode from a quantized runtime must serialize the
    QUANTIZED program (matches the live quantized decode, not the
    exact one)."""
    from onedc_tpu.utils.aot import export_decode, load_exported

    model, rt, rtq = tiny_rts
    key = jax.random.PRNGKey(7)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)

    data = export_decode(rtq, 64, 64, batch=1)
    fn = load_exported(data)
    # the artifact must reproduce the live QUANTIZED _decode_dev for
    # the same (y_hat, z_semantic) operands
    from onedc_tpu.entropy.framing import get_padding_size
    pad = get_padding_size(64, 64, rtq.ds)
    x = rtq._pad_replicate(img.astype(jnp.bfloat16), pad)
    enc = rtq._encode_dev(rtq.params, x)
    crt = rtq._codec_rt
    st = crt._begin(crt.params, enc["z_indices"])
    y_hat = enc["y_hat"].astype(jnp.bfloat16)
    zs = st["z_semantic"].astype(jnp.bfloat16)
    got = np.asarray(fn(rtq.params, y_hat, zs), np.float32)
    want = np.asarray(rtq._decode_dev(rtq.params, y_hat, zs), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-4)
    # and it must differ from the exact program's output (proves the
    # quantization actually rode the export)
    want_exact = np.asarray(rt._decode_dev(rtq.params, y_hat, zs),
                            np.float32)
    assert float(np.max(np.abs(want - want_exact))) > 1e-4


def test_roofline_gate_skips_narrow_ops(monkeypatch):
    """Ops below _Q8_MIN_CH on either side must run exact bf16: the
    measured end-to-end loss of ungated w8a8 came from bandwidth-bound
    narrow convs (device floor 67.3 vs 63.6 ms/img on the same chip
    session)."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(64, (3, 3), padding=1, name="narrow")(x)
            return nn.Conv(320, (3, 3), padding=1, name="wide")(h)

    m = M()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 320))
    p = m.init(jax.random.PRNGKey(1), x)
    monkeypatch.setattr(quant, "QUANT_PREFIXES", ((),))
    monkeypatch.setattr(quant, "_Q8_MIN_CH", 320)

    def lower():
        # fresh closure per lowering: JAX's trace cache keys on the
        # callable's identity, so reusing one function object would
        # silently return the FIRST gate setting's program
        def quant_apply(p, x):
            with w8a8_methods():
                return m.apply(p, x)
        return jax.jit(quant_apply).lower(p, x).as_text()

    # both convs are narrow on one side (320->64, 64->320): at gate 320
    # neither quantizes
    assert "i8" not in lower()
    monkeypatch.setattr(quant, "_Q8_MIN_CH", 64)
    assert "i8" in lower()


def test_spatial_decode_preserves_quant():
    """enable_spatial_decode re-jits the decode programs; a w8a8
    runtime must come out still quantized (and an exact one exact) —
    re-jitting must not silently flip the serving numerics."""
    from onedc_tpu.parallel.mesh import make_mesh
    from onedc_tpu.parallel.spatial import enable_spatial_decode

    model, rt, rtq = _tiny_runtimes()
    mesh = make_mesh(data=2, tensor=4)
    enable_spatial_decode(rtq, mesh)
    enable_spatial_decode(rt, mesh)
    x0 = jnp.zeros((1, 8, 8, model.vae_ch), jnp.bfloat16)
    assert "i8" in rtq._decode_vae.lower(rtq.params, x0).as_text()
    assert "xi8" not in rt._decode_vae.lower(rt.params, x0).as_text()


def test_unknown_quant_mode_rejected(tiny_rts):
    model, rt, _ = tiny_rts
    with pytest.raises(ValueError):
        OneDCRuntime(model, rt.params, quant="w4a4")
