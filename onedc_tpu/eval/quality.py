"""Quality harness: folder-vs-folder metric comparison.

Counterpart of the reference ``src/test_quality.py``: per image PSNR /
MS-SSIM / LPIPS / DISTS + aggregate patch-FID / KID / Inception Score
(Mentzer FID/256 protocol), with per-image + summary reports (CSV, or
xlsx like the reference when an engine is installed).

LPIPS / DISTS / FID / IS need pretrained feature weights (VGG16 /
InceptionV3). In a zero-egress environment those must be provided on
disk: pass ``--lpips_weights`` / ``--dists_weights`` /
``--inception_weights`` (converted safetensors; see
``nn/{lpips,dists,inception}.py`` converters). Metrics without weights
are skipped with a warning; PSNR/MS-SSIM always run.

Usage:
  python -m onedc_tpu.eval.quality --real_dir A --fake_dir B --out out.csv
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import IMG_EXTS, load_image
from ..utils.logging import get_logger
from .metrics import compute_patch_fid, ms_ssim, psnr

log = get_logger("onedc_tpu.quality")


def pair_folders(real_dir, fake_dir):
    real = {p.stem: p for p in Path(real_dir).iterdir()
            if p.suffix.lower() in IMG_EXTS}
    fake = {p.stem: p for p in Path(fake_dir).iterdir()
            if p.suffix.lower() in IMG_EXTS}
    names = sorted(set(real) & set(fake))
    missing = sorted(set(real) ^ set(fake))
    if missing:
        log.warning("unpaired images skipped: %s", missing[:10])
    return [(n, real[n], fake[n]) for n in names]


def test_two_folders(real_dir, fake_dir, out_csv=None,
                     lpips_fn=None, feature_fn=None, dists_fn=None,
                     patch: int = 256):
    pairs = pair_folders(real_dir, fake_dir)
    assert pairs, "no paired images"

    psnr_j = jax.jit(psnr)
    msssim_j = jax.jit(ms_ssim)

    rows = []
    for name, rp, fp in pairs:
        x = load_image(rp) * 0.5 + 0.5   # [0,1]
        y = load_image(fp) * 0.5 + 0.5
        assert x.shape == y.shape, f"{name}: {x.shape} vs {y.shape}"
        xb, yb = jnp.asarray(x)[None], jnp.asarray(y)[None]
        row = {"name": name, "psnr": float(psnr_j(xb, yb)[0])}
        if min(x.shape[0], x.shape[1]) >= 176:
            row["ms_ssim"] = float(msssim_j(xb, yb)[0])
        if lpips_fn is not None:
            row["lpips"] = float(lpips_fn(xb, yb)[0])
        if dists_fn is not None:
            row["dists"] = float(dists_fn(xb, yb)[0])
        rows.append(row)
        log.info("%s %s", name,
                 {k: round(v, 4) for k, v in row.items() if k != "name"})

    summary = {}
    keys = set().union(*(set(r) for r in rows)) - {"name"}
    for k in sorted(keys):
        vals = [r[k] for r in rows if k in r]
        summary[k] = float(np.mean(vals))

    if feature_fn is not None:
        reals = (load_image(rp) for _, rp, _ in pairs)
        fakes = (load_image(fp) for _, _, fp in pairs)
        fid_res = compute_patch_fid(reals, fakes, feature_fn, patch)
        summary.update({"patch_fid": fid_res["fid"],
                        "patch_kid": fid_res["kid_mean"],
                        "patch_kid_std": fid_res["kid_std"]})
        if "inception_mean" in fid_res:
            summary["inception_mean"] = fid_res["inception_mean"]
            summary["inception_std"] = fid_res["inception_std"]
    else:
        log.warning("no feature extractor: FID/KID/IS skipped "
                    "(provide --inception_weights)")

    if out_csv:
        _write_report(rows, summary, out_csv)
    log.info("summary: %s", {k: round(v, 5) for k, v in summary.items()})
    return summary, rows


def _write_report(rows, summary, out_path):
    """CSV always; .xlsx like the reference when an engine is available
    (test_quality.py:296-302 emits quality_detail/summary xlsx)."""
    from pathlib import Path

    import pandas as pd
    out_path = Path(out_path)
    detail = pd.DataFrame(rows)
    summ = pd.DataFrame([summary])

    def summary_path(p: Path) -> Path:
        return p.with_name(p.stem + "_summary" + (p.suffix or ".csv"))

    if out_path.suffix == ".xlsx":
        try:
            detail.to_excel(out_path, index=False)
            summ.to_excel(summary_path(out_path), index=False)
            return
        except (ImportError, ModuleNotFoundError):
            log.warning("no xlsx engine installed; writing CSV instead")
            out_path = out_path.with_suffix(".csv")
    if out_path.suffix != ".csv":
        out_path = out_path.with_suffix(out_path.suffix + ".csv")
    detail.to_csv(out_path, index=False)
    summ.to_csv(summary_path(out_path), index=False)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--real_dir", required=True)
    parser.add_argument("--fake_dir", required=True)
    parser.add_argument("--out", default="quality.csv",
                        help=".csv or .xlsx (reference emits xlsx)")
    parser.add_argument("--lpips_weights", default=None)
    parser.add_argument("--inception_weights", default=None,
                        help="converted InceptionV3 safetensors "
                             "(nn/inception.py:convert_torch_inception)")
    parser.add_argument("--dists_weights", default=None,
                        help="converted DISTS safetensors "
                             "(nn/dists.py:convert_torch_dists)")
    parser.add_argument("--patch", type=int, default=256)
    args = parser.parse_args(argv)

    lpips_fn = None
    if args.lpips_weights:
        from ..nn.lpips import make_lpips_fn
        lpips_fn = make_lpips_fn(args.lpips_weights)
    feature_fn = None
    if args.inception_weights:
        from ..nn.inception import make_inception_fn
        feature_fn = make_inception_fn(args.inception_weights)
    dists_fn = None
    if args.dists_weights:
        from ..nn.dists import make_dists_fn
        dists_fn = make_dists_fn(args.dists_weights)
    test_two_folders(args.real_dir, args.fake_dir, args.out,
                     lpips_fn=lpips_fn, feature_fn=feature_fn,
                     dists_fn=dists_fn, patch=args.patch)


if __name__ == "__main__":
    main()
