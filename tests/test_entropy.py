"""Device-side entropy model tests + a full four-part coding round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from onedc_tpu.entropy import (
    EntropyCoder,
    GaussianConditionalCoder,
    build_gaussian_cdf_table,
    build_indexes,
    gaussian_bits,
    gaussian_prob,
    lower_bound,
    probs_to_bits,
    ste_round,
)
from onedc_tpu.entropy.fourpart import (
    combine_quarters,
    decompress_step_scales,
    decompress_step_update,
    forward_four_part_prior,
    four_part_masks,
    tile_quarters,
)


def torch_gaussian_prob(values, scales):
    """Reference semantics (entropy_models.py:277-295) in torch, for parity."""
    scales = torch.clamp_min(scales, 0.11)
    values = torch.abs(values)
    const = -(2 ** -0.5)
    upper = torch.erfc(const * ((0.5 - values) / scales))
    lower = torch.erfc(const * ((-0.5 - values) / scales))
    return torch.clamp_min(0.5 * (upper - lower), 1e-9)


def test_gaussian_prob_matches_torch(rng):
    v = rng.normal(size=(256,)).astype(np.float32) * 3
    s = (0.05 + rng.random(256) * 5).astype(np.float32)
    ours = np.asarray(gaussian_prob(jnp.asarray(v), jnp.asarray(s)))
    ref = torch_gaussian_prob(torch.tensor(v), torch.tensor(s)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


def test_lower_bound_gradient():
    def f(x):
        return jnp.sum(lower_bound(x, 1.0))

    g = jax.grad(f)(jnp.asarray([0.5, 2.0]))
    # below bound: gradient blocked for positive upstream grad
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])

    def f2(x):
        return jnp.sum(-lower_bound(x, 1.0))

    g2 = jax.grad(f2)(jnp.asarray([0.5, 2.0]))
    # negative upstream grad passes through even below the bound
    np.testing.assert_allclose(np.asarray(g2), [-1.0, -1.0])


def test_ste_round():
    x = jnp.asarray([0.4, 1.6, -0.7])
    np.testing.assert_allclose(np.asarray(ste_round(x)), [0.0, 2.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(ste_round(v) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_build_indexes_skip():
    scales = jnp.asarray([0.0, 0.05, 0.11, 1.0, 64.0, 100.0])
    idx = build_indexes(scales, skip_thres=0.08)
    out = np.asarray(idx)
    assert out[0] == -1 and out[1] == -1
    assert out[2] == 0 and out[4] == 255 and out[5] == 255


def test_gaussian_bits_eval_close_to_train():
    v = jnp.asarray([0.0, 1.0, -2.0])
    s = jnp.asarray([1.0, 1.0, 1.0])
    bt = np.asarray(gaussian_bits(v, s, training=True))
    be = np.asarray(gaussian_bits(v, s, training=False))
    np.testing.assert_allclose(bt, be, rtol=1e-4, atol=1e-4)
    assert np.all(bt >= 0)


def test_masks_partition():
    masks = four_part_masks(6, 8, 8)
    total = sum(np.asarray(m) for m in masks)
    np.testing.assert_array_equal(total, np.ones((1, 6, 8, 8)))
    # each step covers exactly 1/4 of all elements
    for m in masks:
        assert np.asarray(m).sum() == 6 * 8 * 8 / 4


def test_masks_match_reference_layout():
    """Cross-check against the reference mask construction (torch)."""
    h, w, c = 4, 6, 8

    def ref_masks():
        import torch as t

        def one_channel(mh, mw):
            outs = []
            for micro in [((1, 0), (0, 0)), ((0, 1), (0, 0)),
                          ((0, 0), (1, 0)), ((0, 0), (0, 1))]:
                m = t.tensor(micro, dtype=t.float32)
                m = m.repeat((mh + 1) // 2, (mw + 1) // 2)[:mh, :mw]
                outs.append(m[None, None])
            return outs

        m = t.ones((1, c // 4, h, w))
        m0, m1, m2, m3 = one_channel(h, w)
        mask_0 = t.cat((m * m0, m * m1, m * m2, m * m3), dim=1)
        mask_1 = t.cat((m * m3, m * m2, m * m1, m * m0), dim=1)
        mask_2 = t.cat((m * m2, m * m3, m * m0, m * m1), dim=1)
        mask_3 = t.cat((m * m1, m * m0, m * m3, m * m2), dim=1)
        return [mask_0, mask_1, mask_2, mask_3]

    ours = four_part_masks(h, w, c)
    for mine, theirs in zip(ours, ref_masks()):
        # NHWC -> NCHW for comparison
        mine_nchw = np.transpose(np.asarray(mine), (0, 3, 1, 2))
        np.testing.assert_array_equal(mine_nchw, theirs.numpy())


def test_combine_tile_quarters():
    x = jnp.arange(2 * 3 * 4 * 8, dtype=jnp.float32).reshape(2, 3, 4, 8)
    c = combine_quarters(x)
    assert c.shape == (2, 3, 4, 2)
    t = tile_quarters(c)
    assert t.shape == (2, 3, 4, 8)


def test_four_part_roundtrip_with_rans():
    """End-to-end: jitted four-part compress -> rANS -> staged decompress."""
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 8, 8, 16
    y = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32) * 2)
    # fixed "hyperprior": scales positive, means arbitrary
    scales0 = jnp.asarray(0.3 + rng.random((B, H, W, C)).astype(np.float32) * 3)
    means0 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    common = jnp.concatenate([scales0, means0], axis=-1)

    # toy prior nets: deterministic functions of the conditioning tensor
    # (input is y_hat_so_far [C] ++ common params [2C] = 3C channels)
    def mk_prior(seed):
        w_mix = jnp.asarray(
            np.random.default_rng(seed).normal(size=(3 * C, 2 * C)).astype(np.float32) * 0.05)

        def fn(params):
            out = jnp.einsum("bhwc,cd->bhwd", params, w_mix)
            s, m = jnp.split(out, 2, axis=-1)
            return jnp.concatenate([jax.nn.softplus(s) + 0.12, m], axis=-1)

        return fn

    priors = [mk_prior(s) for s in range(3)]

    y_q_w, scales_w, y_hat_enc = forward_four_part_prior(
        y, common, priors, reduction=None, training=False, write=True)

    coder = EntropyCoder()
    gauss = GaussianConditionalCoder()
    gauss.update(force=True, entropy_coder=coder)

    coder.reset()
    for q, s in zip(y_q_w, scales_w):
        gauss.encode(np.asarray(q), np.asarray(s))
    coder.flush()
    stream = coder.get_encoded_stream()
    assert len(stream) > 0

    # staged decompress
    coder.set_stream(stream)
    masks = four_part_masks(H, W, C)
    scales, means = jnp.split(common, 2, axis=-1)
    y_hat = jnp.zeros_like(y)
    for step in range(4):
        if step > 0:
            params = jnp.concatenate([y_hat, common], axis=-1)
            scales, means = jnp.split(priors[step - 1](params), 2, axis=-1)
        scales_r = decompress_step_scales(scales, masks[step])
        y_q_r = gauss.decode_stream(np.asarray(scales_r))
        y_hat = decompress_step_update(jnp.asarray(y_q_r), means, masks[step], y_hat)

    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_hat_enc),
                               rtol=1e-5, atol=1e-5)


def test_cdf_table_shapes():
    cdf, lengths, offsets = build_gaussian_cdf_table()
    assert cdf.shape[0] == 256
    assert np.all(lengths >= 4)
    assert np.all(offsets <= 0)
    # every row: strictly increasing within its length, ends at 2^16
    for i in [0, 100, 255]:
        row = cdf[i, :lengths[i]]
        assert row[0] == 0 and row[-1] == (1 << 16)
        assert np.all(np.diff(row) > 0)
