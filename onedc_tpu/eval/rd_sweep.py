"""RD sweep runner for the lambda checkpoint family.

The reference ships a family of checkpoints (lambda 12.2 .. 0.6 + the
z-only exlow point; readme.md:64,75) and evaluates each with
``src/inference.py`` + ``src/test_quality.py`` by hand. This runner does
the whole rate-distortion curve in one command (SURVEY.md section 7.7 /
BASELINE config 3):

  python -m onedc_tpu.eval.rd_sweep --config configs/rd_sweep.yaml

Config shape:

  dataset_path: /data/kodak
  output_path: outputs/rd_sweep
  model: {...}                  # shared OneDC config
  points:
    - {name: lmbda4.6, ckpt: /ckpts/onedc_lmbda4.6.safetensors}
    - {name: lmbda1.8, ckpt: /ckpts/onedc_lmbda1.8.safetensors}
    - {name: exlow, ckpt: /ckpts/exlow.safetensors,
       model: {z_only: true}}   # per-point overrides win
  # optional quality metrics vs the source images per point:
  lpips_weights: ...
  inception_weights: ...
  dists_weights: ...

Emits ``rd_curve.csv``: one row per point with bpp + PSNR/MS-SSIM (+
LPIPS/DISTS/patch-FID when weights are given) — the numbers behind the
reference's assets/rd_curve.png.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..config import Config, load_config
from ..utils.logging import get_logger
from .inference import Evaluator
from .quality import test_two_folders

log = get_logger("onedc_tpu.rd_sweep")


def run_point(base_cfg: Config, point: dict) -> dict:
    """Encode/decode the dataset with one checkpoint; return summary."""
    from ..config import merge
    cfg = merge(base_cfg, {k: v for k, v in point.items()
                           if k != "name"})
    if "output_path" not in point:  # per-point override wins if given
        cfg["output_path"] = str(
            Path(base_cfg.get("output_path", "outputs/rd_sweep"))
            / point["name"])
    ev = Evaluator(cfg)
    summary = ev.evaluate()
    summary["name"] = point["name"]
    summary["recon_dir"] = str(Path(cfg.output_path) / "recon")
    return summary


def run_sweep(cfg: Config) -> list:
    points = list(cfg.points)
    assert points, "config needs a `points:` list"

    lpips_fn = feature_fn = dists_fn = None
    if cfg.get("lpips_weights"):
        from ..nn.lpips import make_lpips_fn
        lpips_fn = make_lpips_fn(cfg.lpips_weights)
    if cfg.get("inception_weights"):
        from ..nn.inception import make_inception_fn
        feature_fn = make_inception_fn(cfg.inception_weights)
    if cfg.get("dists_weights"):
        from ..nn.dists import make_dists_fn
        dists_fn = make_dists_fn(cfg.dists_weights)

    import pandas as pd
    out = Path(cfg.get("output_path", "outputs/rd_sweep"))
    out.mkdir(parents=True, exist_ok=True)
    csv_path = out / "rd_curve.csv"

    rows = []
    for point in points:
        log.info("=== RD point %s ===", point["name"])
        summary = run_point(cfg, dict(point))
        q, _ = test_two_folders(
            cfg.dataset_path, summary.pop("recon_dir"),
            lpips_fn=lpips_fn, feature_fn=feature_fn, dists_fn=dists_fn)
        summary.update(q)
        rows.append(summary)
        # persist after EVERY point: a failing checkpoint later in the
        # sweep must not discard hours of completed points
        pd.DataFrame(rows).sort_values("bpp").to_csv(csv_path,
                                                     index=False)
        log.info("point %s: bpp=%.4f psnr=%.2f (csv updated)",
                 point["name"], summary["bpp"],
                 summary.get("psnr", float("nan")))
    log.info("wrote %s", csv_path)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    args, overrides = parser.parse_known_args(argv)
    run_sweep(load_config(args.config, overrides))


if __name__ == "__main__":
    main()
