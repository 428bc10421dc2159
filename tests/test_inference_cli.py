"""Inference CLI (T3) end-to-end with random weights: encode -> .bin ->
decode -> PNG + CSV reports, captions riding the container, and the
--decoder_only mode (ref src/inference.py:102-146)."""

import json

import numpy as np
import pytest

from onedc_tpu.config import Config
from onedc_tpu.data.datasets import save_image

TINY_MODEL = dict(
    internal_ch=64, bottleneck_ch=32, unet_ch_config=[32, 64, 64],
    ctrl_ch=32, sd_block_channels=[32, 32, 64, 64], context_dim=64,
    vae_block_channels=[32, 32, 64, 64], vae_attn_patch=4,
)


@pytest.mark.slow
def test_inference_cli_with_captions(tmp_path):
    from onedc_tpu.entropy.framing import decode_i, read_from_file
    from onedc_tpu.eval.inference import Evaluator

    data_dir = tmp_path / "imgs"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("kodim01", "kodim02"):
        save_image(rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
                   data_dir / f"{name}.png")
    captions = {"kodim01": "a red boat on a lake"}
    cap_path = tmp_path / "captions.json"
    cap_path.write_text(json.dumps(captions))

    out_dir = tmp_path / "out"
    cfg = Config.wrap(dict(
        model=TINY_MODEL, dataset_path=str(data_dir),
        output_path=str(out_dir), captions_file=str(cap_path),
        use_bf16=False))
    ev = Evaluator(cfg)
    summary = ev.evaluate()
    assert summary["bpp"] > 0

    # caption bytes really are in the CLI-produced .bin
    data = read_from_file(str(out_dir / "bin" / "kodim01.bin"))
    dec = decode_i(data, ev.runtime._codec_rt.fsq.index_bits,
                   ev.runtime.ds)
    assert dec["bit_stream_caption"] == b"a red boat on a lake"
    data2 = read_from_file(str(out_dir / "bin" / "kodim02.bin"))
    dec2 = decode_i(data2, ev.runtime._codec_rt.fsq.index_bits,
                    ev.runtime.ds)
    assert dec2["bit_stream_caption"] == b""

    # reports + recon written
    assert (out_dir / "bpp_detail.csv").exists()
    assert (out_dir / "recon" / "kodim01.png").exists()
    import pandas as pd
    detail = pd.read_csv(out_dir / "bpp_detail.csv")
    row = detail[detail.name == "kodim01"].iloc[0]
    assert row["bits_caption"] == len(b"a red boat on a lake") * 8

    # decoder_only: fresh Evaluator decodes the .bin with no encoder state
    out2 = tmp_path / "out2"
    cfg2 = Config.wrap(dict(model=TINY_MODEL, dataset_path=str(data_dir),
                            output_path=str(out2), use_bf16=False))
    ev2 = Evaluator(cfg2)
    ev2.decode_only(out_dir / "bin")
    a = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            out2 / "recon" / "kodim01.png"))
    b = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            out_dir / "recon" / "kodim01.png"))
    np.testing.assert_array_equal(a, b)


def test_load_params_from_reference_checkpoint_dir(tmp_path):
    """``checkpoint_path=DIR`` consumes the reference's RELEASED layout
    (model.safetensors + model_1.safetensors) directly, like the
    reference CLI (ref src/inference.py:87-93) — no separate
    convert_weights step. Tiny config + tiny full-layout twins keep this
    in the fast loop; the flagship-size twin port is
    tests/test_twin_checkpoints.py."""
    import sys
    from pathlib import Path

    from safetensors.numpy import save_file

    sys.path.insert(0, str(Path(__file__).parent))
    from twins import codec_twin, sd_unet_twin

    from onedc_tpu.eval.inference import build_model, load_params

    ckpt_dir = tmp_path / "onedc_lmbda4.6"
    ckpt_dir.mkdir()
    save_file(
        sd_unet_twin(in_ch=TINY_MODEL["ctrl_ch"],
                     block_channels=TINY_MODEL["sd_block_channels"],
                     context_dim=TINY_MODEL["context_dim"]),
        str(ckpt_dir / "model.safetensors"))
    save_file(
        codec_twin(ctrl_ch=TINY_MODEL["ctrl_ch"],
                   internal_ch=TINY_MODEL["internal_ch"],
                   bottleneck_ch=TINY_MODEL["bottleneck_ch"],
                   unet_ch_config=TINY_MODEL["unet_ch_config"]),
        str(ckpt_dir / "model_1.safetensors"))

    cfg = Config.wrap(dict(model=TINY_MODEL,
                           checkpoint_path=str(ckpt_dir)))
    model = build_model(cfg)
    params = load_params(model, cfg)

    # a twin tensor landed (not random init): conv_in kernel OIHW->HWIO
    twin = sd_unet_twin(in_ch=TINY_MODEL["ctrl_ch"],
                        block_channels=TINY_MODEL["sd_block_channels"],
                        context_dim=TINY_MODEL["context_dim"])
    got = np.asarray(params["params"]["unet"]["conv_in"]["kernel"])
    np.testing.assert_array_equal(
        got, twin["conv_in.weight"].transpose(2, 3, 1, 0))
    assert params["params"]["codec"]  # codec subtree present
    assert got.dtype == np.float32


def test_load_params_rejects_ambiguous_sources(tmp_path):
    """ckpt= and checkpoint_path= together must fail loudly, not silently
    prefer one (a stale ckpt would shadow the release dir the user just
    pointed at)."""
    from onedc_tpu.eval.inference import build_model, load_params

    cfg = Config.wrap(dict(model=TINY_MODEL, ckpt=str(tmp_path / "a.st"),
                           checkpoint_path=str(tmp_path)))
    model = build_model(cfg)
    with pytest.raises(ValueError, match="ambiguous"):
        load_params(model, cfg)


@pytest.mark.slow
def test_inference_cli_serving_mode(tmp_path):
    """--serving: encode_many + pipelined decode_batch from the CLI.
    Streams must be byte-identical to the per-image mode; recons agree
    to fusion epsilon; the summary gains aggregate throughput."""
    from onedc_tpu.eval.inference import Evaluator

    data_dir = tmp_path / "imgs"
    data_dir.mkdir()
    rng = np.random.default_rng(1)
    # mixed sizes exercise the serving bucketing end-to-end
    save_image(rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
               data_dir / "a.png")
    save_image(rng.uniform(-1, 1, (100, 40, 3)).astype(np.float32),
               data_dir / "b.png")

    cfg = Config.wrap(dict(model=TINY_MODEL, dataset_path=str(data_dir),
                           output_path=str(tmp_path / "serve"),
                           use_bf16=False))
    ev = Evaluator(cfg)
    summary = ev.evaluate_batched()
    assert summary["bpp"] > 0
    assert summary["encodes_per_sec"] > 0
    assert summary["decodes_per_sec"] > 0
    assert (tmp_path / "serve" / "bpp_summary.csv").exists()

    cfg2 = Config.wrap(dict(model=TINY_MODEL, dataset_path=str(data_dir),
                            output_path=str(tmp_path / "per_img"),
                            use_bf16=False))
    ev2 = Evaluator(cfg2)
    ev2.evaluate()
    for name in ("a", "b"):
        sb = (tmp_path / "serve" / "bin" / f"{name}.bin").read_bytes()
        pb = (tmp_path / "per_img" / "bin" / f"{name}.bin").read_bytes()
        assert sb == pb, f"serving stream differs for {name}"
        from PIL import Image
        ra = np.asarray(Image.open(
            tmp_path / "serve" / "recon" / f"{name}.png")).astype(int)
        rb = np.asarray(Image.open(
            tmp_path / "per_img" / "recon" / f"{name}.png")).astype(int)
        assert np.abs(ra - rb).max() <= 1  # fusion epsilon, uint8 domain
