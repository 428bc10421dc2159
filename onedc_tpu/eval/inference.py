"""Inference CLI for the lambda-family models: per-image encode -> .bin ->
decode -> PNG with bpp accounting.

Counterpart of the reference ``src/inference.py`` (Evaluator): same
public flow — build model, ``update(force=True)`` CDF tables, loop a folder
of images, write ``.bin`` + reconstruction, emit per-image CSV + summary —
re-hosted on the JAX runtime. ``--decoder_only`` decodes a pre-written
``.bin`` in a fresh process, proving the bitstream alone suffices
(ref src/inference.py:102-108,144-146).

Usage:
  python -m onedc_tpu.eval.inference --config configs/inference.yaml \
      [key.path=value ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config
from ..data.datasets import ImageFolderDataset, save_image
from ..models.onedc import OneDC, OneDCRuntime
from ..utils.checkpoint import load_safetensors
from ..utils.logging import AvgDict, get_logger

log = get_logger("onedc_tpu.inference")


def build_model(cfg: Config):
    model_kwargs = dict(cfg.get("model", {}))
    return OneDC(**model_kwargs)


def load_params(model: OneDC, cfg: Config):
    """Init abstract params, then fill from checkpoint(s) if provided.

    Two checkpoint flavors, mirroring both user journeys:

    - ``ckpt``: a safetensors file holding OUR full param tree (from
      ``convert_weights onedc`` or a training run).
    - ``checkpoint_path``: a directory in the reference's RELEASED layout
      — ``model.safetensors`` (SD1.5 UNet + LoRA + conv_in +
      vae_reduction) + ``model_1.safetensors`` (IntraNoAR codec) —
      ported on the fly, exactly how the reference CLI consumes it
      (ref src/inference.py:87-93). The release does not carry VAE
      weights (the reference pulls them from the HF ``model_id``), so
      point ``vae_ckpt`` at a converted VAE safetensors
      (``convert_weights``-compatible torch layout) alongside.

    Neither given -> random init (smoke/benchmark mode only).
    """
    key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda x: model.init({"params": key}, x))(img)
    ckpt = cfg.get("ckpt")
    ref_dir = cfg.get("checkpoint_path")
    if ckpt and ref_dir:
        raise ValueError(
            "both ckpt= and checkpoint_path= given — ambiguous weight "
            "source; pass exactly one (ckpt: converted/our tree, "
            "checkpoint_path: reference release dir)")
    if ckpt:
        log.info("loading params from %s", ckpt)
        loaded = load_safetensors(ckpt)
        params = jax.tree_util.tree_map(
            lambda ref, new: jnp.asarray(new).astype(ref.dtype),
            params, loaded)
    elif ref_dir:
        import os

        from ..utils.port_torch import port_onedc_checkpoint

        log.info("porting reference checkpoint dir %s", ref_dir)
        vae_ckpt = cfg.get("vae_ckpt")
        params = port_onedc_checkpoint(
            unet_path=os.path.join(ref_dir, "model.safetensors"),
            codec_path=os.path.join(ref_dir, "model_1.safetensors"),
            vae_path=vae_ckpt,
            reference_params=params,
            require_complete=("unet", "codec"))
        if not vae_ckpt:
            log.warning("checkpoint_path has no VAE weights (the reference "
                        "downloads them from model_id); pass vae_ckpt= for "
                        "a fully-ported model — VAE is RANDOM INIT now")
    else:
        log.warning("no ckpt given: RANDOM INIT (smoke mode)")
    return params


class Evaluator:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model = build_model(cfg)
        self.params = load_params(self.model, cfg)
        dtype = jnp.bfloat16 if cfg.get("use_bf16", True) else None
        # quant=w8a8 -> int8 decode quality stages (nn/quant.py); the
        # stream side stays exact, so .bin files are interchangeable
        # with exact runtimes. vae=tiny -> taesd decode path (the
        # reference's use_large_vae=False); needs tiny_vae_ckpt= weights
        # or it grafts a RANDOM-init tiny decoder (smoke/proxy only).
        vae_mode = cfg.get("vae")
        if vae_mode == "tiny":
            from ..models.onedc import ensure_tiny_vae_params
            tiny_ckpt = cfg.get("tiny_vae_ckpt")
            if tiny_ckpt:
                from ..utils.checkpoint import load_safetensors
                sub = load_safetensors(tiny_ckpt)
                p = dict(self.params)
                p["params"] = dict(self.params["params"])
                p["params"]["vae_tiny_dec"] = sub.get("params", sub)
                self.params = p
            else:
                log.warning("vae=tiny without tiny_vae_ckpt=: TinyVAE "
                            "decoder is RANDOM INIT (smoke mode)")
                self.params = ensure_tiny_vae_params(self.model,
                                                     self.params)
        self.runtime = OneDCRuntime(self.model, self.params, dtype=dtype,
                                    quant=cfg.get("quant"), vae=vae_mode)
        self.runtime.update(force=True)  # CDF build (ref inference.py:72)
        self.out_dir = Path(cfg.get("output_path", "outputs/inference"))
        (self.out_dir / "bin").mkdir(parents=True, exist_ok=True)
        (self.out_dir / "recon").mkdir(parents=True, exist_ok=True)

    def _load_captions(self):
        """Optional ``captions_file`` (JSON {image stem: caption}): the
        caption rides the bitstream container (ref entropy/utils.py:95-105;
        consumed by stage-2 guidance)."""
        path = self.cfg.get("captions_file")
        if not path:
            return {}
        import json
        with open(path) as f:
            return json.load(f)

    def evaluate(self):
        cfg = self.cfg
        ds = ImageFolderDataset(cfg.dataset_path)
        assert len(ds), f"no images under {cfg.dataset_path}"
        captions = self._load_captions()
        rows = []
        avg = AvgDict()
        for i in range(len(ds)):
            item = ds[i]
            name = item["name"]
            img = jnp.asarray(item["image"])[None]
            bin_path = self.out_dir / "bin" / f"{name}.bin"
            caption = captions.get(name, item.get("caption", ""))

            t0 = time.perf_counter()
            _, bpp = self.runtime.encode(img, fp=str(bin_path),
                                         caption=caption)
            t_enc = time.perf_counter() - t0

            t0 = time.perf_counter()
            recon = self.runtime.decode(fp=str(bin_path))
            jax.block_until_ready(recon)
            t_dec = time.perf_counter() - t0

            save_image(np.asarray(recon[0]),
                       self.out_dir / "recon" / f"{name}.png")
            row = {"name": name, **bpp, "enc_s": t_enc, "dec_s": t_dec}
            rows.append(row)
            avg.update({k: v for k, v in row.items() if k != "name"})
            log.info("%s bpp=%.4f (y=%.4f z=%.4f) enc=%.2fs dec=%.2fs",
                     name, bpp["bpp"], bpp["bpp_y"], bpp["bpp_z"],
                     t_enc, t_dec)

        self._write_reports(rows, avg.mean())
        return avg.mean()

    def evaluate_batched(self):
        """Serving-throughput mode (``--serving`` / ``serving: true``):
        all images ride the dispatch-ahead batched encoder
        (``encode_many``) and the software-pipelined batched decoder
        (``decode_batch``) — the exact paths bench.py's headline
        measures — with aggregate encodes/s + decodes/s in the summary.
        Streams, PNGs and bpp tables match ``evaluate()``; per-image
        timing columns are replaced by the aggregate rates."""
        cfg = self.cfg
        from ..entropy.framing import write_to_file

        ds = ImageFolderDataset(cfg.dataset_path)
        assert len(ds), f"no images under {cfg.dataset_path}"
        captions = self._load_captions()
        items = [ds[i] for i in range(len(ds))]
        imgs = [jnp.asarray(it["image"])[None] for it in items]
        caps = [captions.get(it["name"], it.get("caption", ""))
                for it in items]

        t0 = time.perf_counter()
        enc = self.runtime.encode_many(imgs, captions=caps)
        t_enc = time.perf_counter() - t0
        streams = []
        for it, (stream, _) in zip(items, enc):
            write_to_file(stream, str(self.out_dir / "bin"
                                      / f"{it['name']}.bin"))
            streams.append(stream)

        t0 = time.perf_counter()
        recons = self.runtime.decode_batch(streams)
        jax.block_until_ready(recons[-1])
        t_dec = time.perf_counter() - t0

        rows = []
        avg = AvgDict()
        for it, (_, bpp), recon in zip(items, enc, recons):
            save_image(np.asarray(recon[0]),
                       self.out_dir / "recon" / f"{it['name']}.png")
            row = {"name": it["name"], **bpp}
            rows.append(row)
            avg.update({k: v for k, v in row.items() if k != "name"})
        summary = avg.mean()
        n = len(items)
        summary["encodes_per_sec"] = n / t_enc
        summary["decodes_per_sec"] = n / t_dec
        log.info("serving: %.2f encodes/s, %.2f decodes/s over %d images",
                 summary["encodes_per_sec"], summary["decodes_per_sec"], n)
        self._write_reports(rows, summary)
        return summary

    def decode_only(self, bin_path):
        """Decode an existing .bin with no encoder state (ref --decoder_only)."""
        bin_path = Path(bin_path)
        bins = ([bin_path] if bin_path.is_file()
                else sorted(bin_path.glob("*.bin")))
        for b in bins:
            recon = self.runtime.decode(fp=str(b))
            out = self.out_dir / "recon" / f"{b.stem}.png"
            save_image(np.asarray(recon[0]), out)
            log.info("decoded %s -> %s", b.name, out)

    def _write_reports(self, rows, summary):
        import pandas as pd
        detail = pd.DataFrame(rows)
        summ = pd.DataFrame([summary])
        detail.to_csv(self.out_dir / "bpp_detail.csv", index=False)
        summ.to_csv(self.out_dir / "bpp_summary.csv", index=False)
        try:  # xlsx twins like the reference (src/inference.py:129-135),
            # when an engine (openpyxl/xlsxwriter) is installed
            detail.to_excel(self.out_dir / "bpp_detail.xlsx", index=False)
            summ.to_excel(self.out_dir / "bpp_summary.xlsx", index=False)
        except (ImportError, ModuleNotFoundError, ValueError):
            pass
        log.info("summary: %s", {k: round(v, 5) for k, v in summary.items()})


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--decoder_only", action="store_true")
    parser.add_argument("--decoder_bin_path", default=None)
    parser.add_argument("--serving", action="store_true",
                        help="batched serving paths (encode_many + "
                             "pipelined decode_batch) with aggregate "
                             "throughput instead of per-image timing")
    args, overrides = parser.parse_known_args(argv)
    cfg = load_config(args.config, overrides)

    ev = Evaluator(cfg)
    if args.decoder_only:
        assert args.decoder_bin_path, "--decoder_bin_path required"
        ev.decode_only(args.decoder_bin_path)
    elif args.serving or cfg.get("serving"):
        ev.evaluate_batched()
    else:
        ev.evaluate()


if __name__ == "__main__":
    main()
