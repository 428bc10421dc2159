"""Composite OneDC model: train forward, full encode->bytes->decode round
trip through VAE + codec + one-step UNet (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onedc_tpu.models.onedc import OneDC, OneDCRuntime

TINY = dict(
    internal_ch=64,
    bottleneck_ch=32,
    unet_ch_config=(32, 64, 64),
    ctrl_ch=32,
    sd_block_channels=(32, 32, 64, 64),
    context_dim=64,
    vae_block_channels=(32, 32, 64, 64),
    vae_attn_patch=4,
)


@pytest.fixture(scope="module")
def onedc_setup():
    model = OneDC(**TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    return model, params, img


def test_train_forward(onedc_setup):
    model, params, img = onedc_setup
    enc_dict, pred = jax.jit(
        lambda p, x: model.apply(p, x, training=True,
                                 noise_rng=jax.random.PRNGKey(1)))(params, img)
    assert pred.shape == img.shape
    assert enc_dict["x_latent"].shape == (1, 8, 8, 4)
    assert enc_dict["x_latent_recon"].shape == (1, 8, 8, 4)
    assert float(enc_dict["bpp"]) > 0
    assert np.all(np.isfinite(np.asarray(pred)))


def test_encode_decode_round_trip(onedc_setup, tmp_path):
    model, params, img = onedc_setup
    rt = OneDCRuntime(model, params)
    rt.update(force=True)

    # odd size exercises padding
    img_odd = img[:, :50, :39, :]
    fp = tmp_path / "img.bin"
    stream, bpp = rt.encode(img_odd, fp=str(fp))
    assert bpp["bpp"] > 0
    assert fp.stat().st_size == len(stream)

    pred = rt.decode(stream=stream)
    assert pred.shape == (1, 50, 39, 3)
    assert np.all(np.isfinite(np.asarray(pred)))

    pred2 = rt.decode(fp=str(fp))
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred2))

    # caption bytes ride the container (ref entropy/utils.py:95-105)
    from onedc_tpu.entropy.framing import decode_i
    cap_stream, cap_bpp = rt.encode(img_odd, caption="a test caption")
    assert cap_bpp["bits_caption"] == len(b"a test caption") * 8
    dec = decode_i(bytes(cap_stream), rt._codec_rt.fsq.index_bits, rt.ds)
    assert dec["bit_stream_caption"] == b"a test caption"
    pred3 = rt.decode(stream=cap_stream)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred3))


def test_decode_batch_matches_sequential(onedc_setup):
    """Batched decode == sequential decode, including MIXED padded sizes
    (bucketed, e.g. a Kodak folder of portrait+landscape) and unpadded
    odd sizes within a bucket."""
    model, params, img = onedc_setup
    rt = OneDCRuntime(model, params)
    rt.update()
    key = jax.random.PRNGKey(7)
    imgs = [img,
            jnp.clip(img + 0.1 * jax.random.normal(key, img.shape), -1, 1),
            img[:, :50, :39, :],                       # same 64x64 bucket
            jnp.tile(img, (1, 1, 2, 1))[:, :60, :, :]]  # 64x128 bucket
    streams = [rt.encode(im)[0] for im in imgs]
    batched = rt.decode_batch(streams)
    assert len(batched) == len(imgs)
    for im, s, b in zip(imgs, streams, batched):
        assert b.shape == im.shape
        single = rt.decode(stream=s)
        # pipelined NN body runs as two programs (x0 + VAE) vs the fused
        # serial program: float-epsilon fusion differences only
        np.testing.assert_allclose(np.asarray(b), np.asarray(single),
                                   atol=5e-4)


def test_decode_batch_multi_chunk_schedule(onedc_setup, monkeypatch):
    """chunk=1 forces the pipelined path through MULTIPLE chunk state
    machines interleaved at depth 2 (copy_to_host_async lookahead); the
    schedule must not change results vs the serial single decode."""
    model, params, img = onedc_setup
    monkeypatch.setenv("ONEDC_PIPELINE_CHUNK", "1")
    rt = OneDCRuntime(model, params)
    rt.update()
    key = jax.random.PRNGKey(11)
    imgs = [jnp.clip(img + 0.1 * jax.random.normal(
        jax.random.fold_in(key, i), img.shape), -1, 1) for i in range(3)]
    streams = [rt.encode(im)[0] for im in imgs]
    batched = rt.decode_batch(streams)
    for s, b in zip(streams, batched):
        np.testing.assert_allclose(np.asarray(b),
                                   np.asarray(rt.decode(stream=s)),
                                   atol=5e-4)


def test_decode_batch_vae_subchunk_schedule(onedc_setup, monkeypatch):
    """ONEDC_VAE_CHUNK=1 splits the pipelined VAE stage into per-image
    sub-dispatches (the schedule that lets the prior/UNet chunk grow
    past the VAE's HBM budget); results must match the serial decode
    and the parts must reassemble in order."""
    model, params, img = onedc_setup
    monkeypatch.setenv("ONEDC_PIPELINE_CHUNK", "3")
    monkeypatch.setenv("ONEDC_VAE_CHUNK", "1")
    rt = OneDCRuntime(model, params)
    rt.update()
    key = jax.random.PRNGKey(13)
    imgs = [jnp.clip(img + 0.1 * jax.random.normal(
        jax.random.fold_in(key, i), img.shape), -1, 1) for i in range(3)]
    streams = [rt.encode(im)[0] for im in imgs]
    batched = rt.decode_batch(streams)
    for s, b in zip(streams, batched):
        np.testing.assert_allclose(np.asarray(b),
                                   np.asarray(rt.decode(stream=s)),
                                   atol=5e-4)


def test_calibrate_stream_params(onedc_setup):
    """calibrate_stream_params shrinks the stream rate monotonically-ish
    toward the realistic band while the codec remains a working
    end-to-end coder (bench stream calibration, VERDICT r3 item 2)."""
    from onedc_tpu.utils.calibrate import calibrate_stream_params

    model, params, img = onedc_setup
    rt = OneDCRuntime(model, params)
    rt.update()
    _, bpp_raw = rt.encode(img)

    rt.set_params(calibrate_stream_params(params, 0.05))
    stream, bpp_cal = rt.encode(img)
    assert bpp_cal["bpp_y"] < 0.5 * bpp_raw["bpp_y"]
    pred = rt.decode(stream=stream)
    assert pred.shape == img.shape
    assert np.all(np.isfinite(np.asarray(pred)))

    # scale=1.0 is the identity (same bytes)
    rt.set_params(calibrate_stream_params(params, 1.0))
    s_id, b_id = rt.encode(img)
    assert abs(b_id["bpp_y"] - bpp_raw["bpp_y"]) < 1e-9


def test_encode_many_matches_serial(onedc_setup, monkeypatch):
    """encode_many (dispatch-ahead chunked device encode, single-fetch
    host container writing) must produce byte-identical streams and bpp
    dicts to per-image encode, across mixed sizes and captions."""
    model, params, img = onedc_setup
    monkeypatch.setenv("ONEDC_PIPELINE_CHUNK", "2")
    rt = OneDCRuntime(model, params)
    rt.update()
    key = jax.random.PRNGKey(5)
    imgs = [jnp.clip(img + 0.1 * jax.random.normal(
        jax.random.fold_in(key, i), img.shape), -1, 1) for i in range(3)]
    # a different raw size lands in its own bucket
    imgs.append(imgs[0][:, :32, :, :])
    caps = ["", "a cat", "", "wide shot"]
    many = rt.encode_many(imgs, captions=caps)
    for im, cap, (stream, bpp) in zip(imgs, caps, many):
        ref_stream, ref_bpp = rt.encode(im, caption=cap)
        assert bytes(stream) == bytes(ref_stream)
        assert bpp == ref_bpp


def test_tiny_vae_decode_path(tmp_path):
    """use_large_vae=False: encode rides the large VAE encoder, decode the
    taesd TinyVAE (ref model_..._stage1.py:39-54,184-195)."""
    model = OneDC(use_large_vae=False, **TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    assert "vae_tiny_dec" in params["params"]
    rt = OneDCRuntime(model, params)
    rt.update(force=True)
    stream, bpp = rt.encode(img)
    assert bpp["bpp"] > 0
    pred = rt.decode(stream=stream)
    assert pred.shape == img.shape
    assert np.all(np.isfinite(np.asarray(pred)))
    # the pipelined serving path (bench stage lambda_tinyvae) must route
    # through the TinyVAE decoder too and match the single decode
    streams = [rt.encode(jax.random.uniform(
        jax.random.fold_in(key, i), (1, 64, 64, 3), minval=-1, maxval=1))[0]
        for i in range(3)]
    batch = rt.decode_batch(streams)
    for s, b in zip(streams, batch):
        one = rt.decode(stream=s)
        # B=3 vs B=1 conv lowerings + the two-program pipelined split:
        # float-epsilon accumulation-order differences only
        np.testing.assert_allclose(np.asarray(b), np.asarray(one),
                                   atol=2e-3)


def test_tiny_vae_runtime_mode(onedc_setup):
    """VERDICT r4 next-step 3: ``OneDCRuntime(vae="tiny")`` productizes
    the TinyVAE decode as a runtime mode — a LARGE-VAE model + params
    tree gets the taesd decoder grafted in (ensure_tiny_vae_params) and
    must decode identically to a model built with use_large_vae=False
    carrying the same weights. Streams are mode-independent (encode is
    exact/large-VAE in both)."""
    from onedc_tpu.models.onedc import ensure_tiny_vae_params

    model, params, img = onedc_setup
    assert "vae_tiny_dec" not in params["params"]

    # missing tiny params must fail loudly, not at trace time
    with pytest.raises(AssertionError, match="vae_tiny_dec"):
        OneDCRuntime(model, params, vae="tiny")
    with pytest.raises(ValueError, match="vae mode"):
        OneDCRuntime(model, params, vae="taesd")

    grafted = ensure_tiny_vae_params(model, params)
    assert "vae_tiny_dec" in grafted["params"]
    # idempotent, and the input tree is not mutated
    assert ensure_tiny_vae_params(model, grafted) is grafted
    assert "vae_tiny_dec" not in params["params"]

    rt_mode = OneDCRuntime(model, grafted, vae="tiny")
    rt_mode.update(force=True)
    assert not rt_mode.model.use_large_vae

    flag_model = OneDC(use_large_vae=False, **TINY)
    rt_flag = OneDCRuntime(flag_model, grafted)
    rt_flag.update(force=True)

    s_mode, bpp_mode = rt_mode.encode(img)
    s_flag, bpp_flag = rt_flag.encode(img)
    assert bytes(s_mode) == bytes(s_flag)
    assert bpp_mode["bpp"] == pytest.approx(bpp_flag["bpp"])
    np.testing.assert_array_equal(
        np.asarray(rt_mode.decode(stream=s_mode)),
        np.asarray(rt_flag.decode(stream=s_mode)))

    # vae="large" on the grafted tree ignores the extra subtree and
    # matches the plain large-VAE runtime bit for bit
    rt_large = OneDCRuntime(model, grafted, vae="large")
    rt_large.update(force=True)
    rt_plain = OneDCRuntime(model, params)
    rt_plain.update(force=True)
    np.testing.assert_array_equal(
        np.asarray(rt_large.decode(stream=s_mode)),
        np.asarray(rt_plain.decode(stream=s_mode)))


def test_decode_matches_eval_forward(onedc_setup):
    """Bitstream decode must agree with the direct eval forward (the
    quantized math is identical; rANS is lossless)."""
    model, params, img = onedc_setup
    rt = OneDCRuntime(model, params)
    rt.update()
    stream, _ = rt.encode(img)
    pred_stream = rt.decode(stream=stream)
    _, pred_fwd = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    np.testing.assert_allclose(np.asarray(pred_stream), np.asarray(pred_fwd),
                               rtol=2e-4, atol=2e-4)


def test_z_only_decode_batch_chunked(monkeypatch):
    """z-only serving decode is CHUNKED (a whole bucket in one program
    would blow HBM at full size — flat B=16 OOMs on VAE activations):
    chunk=1 must be bit-identical to per-stream decode, chunk=2 within
    batch-lowering float epsilon."""
    model = OneDC(z_only=True, **TINY)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 64, 64, 3), minval=-1, maxval=1)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    rt = OneDCRuntime(model, params)
    rt.update(force=True)
    imgs = [jax.random.uniform(jax.random.fold_in(key, i), (1, 64, 64, 3),
                               minval=-1, maxval=1) for i in range(3)]
    streams = [rt.encode(im)[0] for im in imgs]
    singles = [rt.decode(stream=s) for s in streams]

    monkeypatch.setenv("ONEDC_PIPELINE_CHUNK", "1")
    for b, one in zip(rt.decode_batch(streams), singles):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(one))
    monkeypatch.setenv("ONEDC_PIPELINE_CHUNK", "2")
    for b, one in zip(rt.decode_batch(streams), singles):
        np.testing.assert_allclose(np.asarray(b), np.asarray(one), atol=2e-3)

    # captions must ride the z-only container too — through both the
    # single-image encode and the serving encode_many path
    from onedc_tpu.entropy.framing import decode_i
    cap_stream, cap_bpp = rt.encode(imgs[0], caption="exlow caption")
    assert cap_bpp["bits_caption"] == len(b"exlow caption") * 8
    dec = decode_i(bytes(cap_stream), rt._codec_rt.fsq.index_bits, rt.ds)
    assert dec["bit_stream_caption"] == b"exlow caption"
    many = rt.encode_many(imgs, captions=["c0", "", "c2"])
    for (s, _), want in zip(many, [b"c0", b"", b"c2"]):
        got = decode_i(bytes(s), rt._codec_rt.fsq.index_bits, rt.ds)
        assert got["bit_stream_caption"] == want
