"""InceptionV3 / DISTS / Inception Score metric stack (VERDICT item 3).

Pretrained weights are unavailable in this environment, so these tests
validate: (a) conversion math (BN folding) against torch eval-mode
numerics, (b) module mechanics on random weights, and (c) the quality CLI
emitting patch_fid/kid/dists/IS end-to-end on a synthetic fixture.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from onedc_tpu.eval.metrics import inception_score, to_uint8_range
from onedc_tpu.nn.dists import (
    DISTS,
    l2_pool,
    make_dists_fn,
    random_dists_weights,
)
from onedc_tpu.nn.inception import (
    BasicConv,
    convert_torch_inception,
    make_inception_fn,
    random_inception_weights,
)
from onedc_tpu.utils.checkpoint import save_safetensors


def test_bn_folding_matches_torch_eval():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3)
    with torch.no_grad():
        bn.running_mean.uniform_(-1.0, 1.0)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-1.0, 1.0)
    bn.eval()
    x = torch.randn(2, 3, 17, 17)
    with torch.no_grad():
        ref = torch.relu(bn(conv(x))).numpy().transpose(0, 2, 3, 1)

    state = {
        "blk.conv.weight": conv.weight.detach().numpy(),
        "blk.bn.weight": bn.weight.detach().numpy(),
        "blk.bn.bias": bn.bias.detach().numpy(),
        "blk.bn.running_mean": bn.running_mean.numpy(),
        "blk.bn.running_var": bn.running_var.numpy(),
        "fc.weight": np.zeros((5, 8), np.float32),
        "fc.bias": np.zeros(5, np.float32),
    }
    flat = convert_torch_inception(state)
    params = {"params": {"conv": {
        "kernel": jnp.asarray(flat["blk/conv/kernel"]),
        "bias": jnp.asarray(flat["blk/conv/bias"])}}}
    mod = BasicConv(8, (3, 3), stride=2)
    out = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_inception_feature_fn_shapes(tmp_path):
    flat = random_inception_weights(num_classes=8)
    wpath = tmp_path / "inception.safetensors"
    save_safetensors(flat, wpath)
    fn = make_inception_fn(str(wpath), batch=3)
    patches = np.random.default_rng(0).uniform(
        0, 255, (5, 64, 64, 3)).astype(np.float32)
    out = fn(patches)
    assert out["features"].shape == (5, 2048)
    assert out["logits"].shape == (5, 8)
    assert np.all(np.isfinite(out["features"]))
    # padding batch does not change results vs one-shot
    out2 = fn(patches[:3])
    np.testing.assert_allclose(out["features"][:3], out2["features"],
                               rtol=2e-4, atol=2e-4)


def test_inception_score_behaviour():
    # uniform predictions -> IS ~ 1
    flat_logits = np.zeros((40, 10))
    m, s = inception_score(flat_logits)
    assert abs(m - 1.0) < 1e-6
    # confident diverse predictions -> IS ~ num classes
    idx = np.arange(40) % 10
    sharp = np.full((40, 10), -20.0)
    sharp[np.arange(40), idx] = 20.0
    # splits=1: the marginal over ALL samples is uniform -> IS = 10
    # regardless of the torchmetrics-style pre-split shuffle
    m2, _ = inception_score(sharp, splits=1)
    np.testing.assert_allclose(m2, 10.0, rtol=1e-6)
    # multi-split IS is computed over SHUFFLED samples (the torchmetrics
    # protocol): class-sorted inputs must NOT score as per-split-pure
    sorted_sharp = sharp[np.argsort(idx)]
    m3, _ = inception_score(sorted_sharp, splits=10)
    assert m3 < 10.0 - 1e-3


def test_to_uint8_range():
    x = np.asarray([0.0, 0.5, 1.0, 1.2, -0.1])
    np.testing.assert_array_equal(to_uint8_range(x),
                                  [0.0, 128.0, 255.0, 255.0, 0.0])


def test_l2_pool_is_windowed_rms():
    x = jnp.ones((1, 8, 8, 2)) * 3.0
    out = l2_pool(x)
    assert out.shape == (1, 4, 4, 2)
    # constant input: RMS of a normalized window of 9s = 3 (interior)
    np.testing.assert_allclose(np.asarray(out)[0, 1:3, 1:3], 3.0, rtol=1e-5)


def test_dists_zero_on_identical_and_positive_on_different(tmp_path):
    flat = random_dists_weights()
    wpath = tmp_path / "dists.safetensors"
    save_safetensors(flat, wpath)
    fn = make_dists_fn(str(wpath))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    same = np.asarray(fn(x, x))
    diff = np.asarray(fn(x, y))
    assert same.shape == (2,)
    np.testing.assert_allclose(same, 0.0, atol=1e-5)
    assert np.all(np.abs(diff) > np.abs(same))


@pytest.mark.slow
def test_quality_cli_full_stack(tmp_path):
    from onedc_tpu.data.datasets import save_image
    from onedc_tpu.eval import quality

    rng = np.random.default_rng(0)
    real = tmp_path / "real"
    fake = tmp_path / "fake"
    real.mkdir()
    fake.mkdir()
    for i in range(3):
        img = rng.uniform(-1, 1, (288, 288, 3)).astype(np.float32)
        save_image(img, real / f"im{i}.png")
        save_image(np.clip(img + rng.normal(0, 0.1, img.shape), -1, 1)
                   .astype(np.float32), fake / f"im{i}.png")

    save_safetensors(random_inception_weights(num_classes=8),
                     tmp_path / "inc.safetensors")
    save_safetensors(random_dists_weights(), tmp_path / "dists.safetensors")

    out = tmp_path / "q.csv"
    quality.main([
        "--real_dir", str(real), "--fake_dir", str(fake),
        "--out", str(out),
        "--inception_weights", str(tmp_path / "inc.safetensors"),
        "--dists_weights", str(tmp_path / "dists.safetensors"),
    ])
    import pandas as pd
    summary = pd.read_csv(tmp_path / "q_summary.csv").iloc[0].to_dict()
    for k in ("psnr", "ms_ssim", "dists", "patch_fid", "patch_kid",
              "inception_mean"):
        assert k in summary and np.isfinite(summary[k]), k
    detail = pd.read_csv(out)
    assert set(detail["name"]) == {"im0", "im1", "im2"}
    assert "dists" in detail.columns
