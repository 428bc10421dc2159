"""Losses, lambda schedule, data pipeline, checkpoint I/O."""

import jax
import jax.numpy as jnp
import numpy as np

from onedc_tpu.data.datasets import (
    ConcatDataset,
    DataLoader,
    ImageFolderDataset,
    MultiResolutionCrop,
    center_crop,
    random_crop,
    resize_if_small,
    save_image,
)
from onedc_tpu.train.losses import RDLoss, lambda_schedule
from onedc_tpu.utils.checkpoint import (
    flatten_params,
    load_safetensors,
    parse_step_from_path,
    save_safetensors,
    unflatten_params,
)
from onedc_tpu.utils.logging import AvgDict


def test_lambda_schedule_quadratic_ramp():
    np.testing.assert_allclose(float(lambda_schedule(0, 0, 4000, 1e-4, 1.8)),
                               1e-4, rtol=1e-6)
    mid = float(lambda_schedule(2000, 0, 4000, 1e-4, 1.8))
    assert abs(mid - (1e-4 + 0.25 * (1.8 - 1e-4))) < 1e-6
    assert abs(float(lambda_schedule(9999, 0, 4000, 1e-4, 1.8)) - 1.8) < 1e-6


def test_rd_loss_terms(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    y = x + 0.1
    loss = RDLoss(pix_weight=2.0, lpips_weight=1.0, lmbda=4.6)
    total, ld = loss(x, y, jnp.asarray(0.5), training=False)
    # inputs mapped to [0,1] so |diff| halves
    np.testing.assert_allclose(float(ld["pix"]), 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(ld["weighted_bpp"]), 0.5 * 4.6, rtol=1e-6)
    np.testing.assert_allclose(
        float(total), float(ld["distortion"]) + float(ld["weighted_bpp"]),
        rtol=1e-6)
    assert float(ld["lpips"]) == 0.0  # no lpips_fn


def test_avg_dict():
    a = AvgDict()
    a.update({"x": 1.0})
    a.update({"x": 3.0, "y": 2.0})
    m = a.mean()
    assert m["x"] == 2.0 and m["y"] == 2.0


def test_crops_and_resize(rng):
    img = rng.uniform(-1, 1, (100, 80, 3)).astype(np.float32)
    up = resize_if_small(img, 128)
    assert min(up.shape[:2]) >= 128
    c = random_crop(img, 64, np.random.default_rng(0))
    assert c.shape == (64, 64, 3)
    cc = center_crop(img, 64)
    assert cc.shape == (64, 64, 3)


def test_multires_crop_deterministic():
    crop = MultiResolutionCrop([256, 512, 1024], [1.0, 1.0, 0.25])
    picks = [crop.pick(s) for s in range(20)]
    assert picks == [crop.pick(s) for s in range(20)]  # same on every host
    assert len({p[0] for p in picks}) > 1


def test_dataset_loader_roundtrip(tmp_path, rng):
    for i in range(5):
        save_image(rng.uniform(-1, 1, (40, 40, 3)).astype(np.float32),
                   tmp_path / f"img_{i}.png")
    ds = ImageFolderDataset(tmp_path)
    assert len(ds) == 5
    item = ds[0]
    assert item["image"].shape == (40, 40, 3)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0

    dl = DataLoader(ds, 2, shuffle=True)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 40, 40, 3)

    cat = ConcatDataset([ds, ds])
    assert len(cat) == 10
    assert cat[7]["name"] == ds[2]["name"]


def test_safetensors_roundtrip(tmp_path, rng):
    params = {"params": {"a": {"kernel": rng.normal(size=(3, 3)).astype(np.float32)},
                         "b": {"bias": np.zeros(4, np.float32)}}}
    p = tmp_path / "w.safetensors"
    save_safetensors(params, p)
    loaded = load_safetensors(p)
    flat0 = flatten_params(params)
    flat1 = flatten_params(loaded)
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_array_equal(flat0[k], flat1[k])
    assert unflatten_params(flat1)["params"]["b"]["bias"].shape == (4,)


def test_parse_step_from_path():
    assert parse_step_from_path("/x/checkpoint_model_012345") == 12345


def test_frozen_params_do_not_update():
    """Regression: optax.masked passes grads through for masked-out leaves;
    our multi_transform freeze must hard-zero them."""
    import optax
    from onedc_tpu.train.step import make_masked_optimizer, make_optimizer

    params = {"params": {"vae": {"w": jnp.ones(3)},
                         "codec": {"w": jnp.ones(3)}}}
    # warmup_steps=0: the warmup schedule starts at lr=0, which would make
    # the trainable branch a no-op at step 0 too
    tx = make_masked_optimizer(params, make_optimizer(lr=0.1, warmup_steps=0),
                               ("vae",))
    @jax.jit
    def step(params):
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        return optax.apply_updates(params, updates)

    new = step(params)
    np.testing.assert_array_equal(np.asarray(new["params"]["vae"]["w"]),
                                  np.ones(3))
    assert not np.allclose(np.asarray(new["params"]["codec"]["w"]),
                           np.ones(3))


def test_grain_loader_exercise(tmp_path, rng):
    """Production grain pipeline: deterministic shuffle, batching, and
    batch shapes matching DataLoader's (ROADMAP round-1 item 7)."""
    from onedc_tpu.data.datasets import (
        ImageFolderDataset,
        make_grain_loader,
        save_image,
    )

    data_dir = tmp_path / "imgs"
    data_dir.mkdir()
    for i in range(10):
        save_image(rng.uniform(-1, 1, (48, 48, 3)).astype(np.float32),
                   data_dir / f"im{i}.png")
    ds = ImageFolderDataset(str(data_dir))

    it = make_grain_loader(ds, batch_size=4, shuffle=True, seed=0,
                           num_workers=0, num_epochs=1)
    batches = list(it)
    assert len(batches) == 2  # drop_remainder over 10 items
    for b in batches:
        assert b["image"].shape == (4, 48, 48, 3)
        assert len(b["caption"]) == 4 and len(b["name"]) == 4
    names = [n for b in batches for n in b["name"]]
    assert len(set(names)) == 8  # no duplicates within the epoch

    # deterministic under the same seed
    it2 = make_grain_loader(ds, batch_size=4, shuffle=True, seed=0,
                            num_workers=0, num_epochs=1)
    names2 = [n for b in it2 for n in b["name"]]
    assert names == names2
