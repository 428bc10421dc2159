"""RD sweep runner: two points end-to-end on a tiny dataset."""

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
def test_rd_sweep_two_points(tmp_path):
    from onedc_tpu.eval.rd_sweep import run_sweep

    rng = np.random.default_rng(0)
    data = tmp_path / "imgs"
    data.mkdir()
    for i in range(2):
        save_image(rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32),
                   data / f"im{i}.png")

    cfg = Config.wrap(dict(
        dataset_path=str(data),
        output_path=str(tmp_path / "sweep"),
        model=TINY_MODEL,
        use_bf16=False,
        points=[
            {"name": "lambda_point"},
            {"name": "exlow", "model": {"z_only": True}},
        ],
    ))
    rows = run_sweep(cfg)
    assert len(rows) == 2
    by_name = {r["name"]: r for r in rows}
    # the z-only point must be far cheaper in rate (14 bits / 64x64 block)
    assert by_name["exlow"]["bpp"] < by_name["lambda_point"]["bpp"]
    assert by_name["exlow"]["bpp_y"] == 0.0
    for r in rows:
        assert np.isfinite(r["psnr"])

    import pandas as pd
    df = pd.read_csv(tmp_path / "sweep" / "rd_curve.csv")
    assert list(df["name"]) == ["exlow", "lambda_point"]  # sorted by bpp
