"""Metric kernels: PSNR/SSIM/MS-SSIM sanity + FID/KID math."""

import jax.numpy as jnp
import numpy as np

from onedc_tpu.eval.metrics import (
    FeatureStats,
    extract_patches,
    frechet_distance,
    ms_ssim,
    polynomial_kid,
    psnr,
    ssim,
)


def test_psnr_known_value(rng):
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    noise = (rng.normal(size=x.shape) * 0.1).astype(np.float32)
    y = np.clip(x + noise, 0, 1)
    expected = 10 * np.log10(1.0 / np.mean((x - y) ** 2, axis=(1, 2, 3)))
    np.testing.assert_allclose(np.asarray(psnr(jnp.asarray(x), jnp.asarray(y))),
                               expected, rtol=1e-4)


def test_ssim_identity_and_ordering(rng):
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))[0]) > 0.999
    y1 = np.clip(x + rng.normal(size=x.shape).astype(np.float32) * 0.02, 0, 1)
    y2 = np.clip(x + rng.normal(size=x.shape).astype(np.float32) * 0.2, 0, 1)
    s1 = float(ssim(jnp.asarray(x), jnp.asarray(y1))[0])
    s2 = float(ssim(jnp.asarray(x), jnp.asarray(y2))[0])
    assert s1 > s2


def test_ms_ssim_range(rng):
    x = rng.uniform(size=(1, 192, 192, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(size=x.shape).astype(np.float32) * 0.05, 0, 1)
    v = float(ms_ssim(jnp.asarray(x), jnp.asarray(y))[0])
    assert 0.0 < v <= 1.0
    vi = float(ms_ssim(jnp.asarray(x), jnp.asarray(x))[0])
    assert vi > 0.999


def test_extract_patches_protocol():
    img = np.zeros((600, 520, 3), np.float32)
    normal = extract_patches(img, 256, shifted=False)
    shifted = extract_patches(img, 256, shifted=True)
    assert len(normal) == 4    # 2x2 grid from (0,0)
    assert len(shifted) == 1   # 1x1 grid from (128,128)
    small = extract_patches(np.zeros((200, 200, 3), np.float32), 256)
    assert small == []


def test_frechet_distance_identical_is_zero(rng):
    feats = rng.normal(size=(500, 16))
    st = FeatureStats(16)
    st.update(feats)
    mu, cov = st.mean_cov()
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_kid_identical_near_zero(rng):
    feats = rng.normal(size=(300, 8)).astype(np.float64)
    mean, _ = polynomial_kid(feats, feats, subset_size=100, n_subsets=10)
    assert abs(mean) < 1.0
    other = rng.normal(size=(300, 8)) + 5.0
    mean2, _ = polynomial_kid(feats, other, subset_size=100, n_subsets=10)
    assert mean2 > mean
