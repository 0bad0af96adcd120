"""Data pipeline additions: AutoAugment equivalent, dead-leaves pool,
layer-freeze optimizer wrapper (reference ``train.py:82``,
``mlicpp_small_decoder.py:508-517``)."""

import numpy as np
import pytest

from mlic_tpu.data.autoaugment import (IMAGENET_POLICY, _apply_op,
                                       _magnitude, autoaugment)
from mlic_tpu.data.folder import dead_leaves_pool, pool_batches


def test_autoaugment_preserves_shape_dtype():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 80, 3), dtype=np.uint8)
    for seed in range(8):
        out = autoaugment(img, np.random.default_rng(seed))
        assert out.shape == img.shape and out.dtype == np.uint8


def test_autoaugment_every_op_runs():
    from PIL import Image
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (64, 64, 3), dtype=np.uint8))
    ops = {op for sub in IMAGENET_POLICY for op, _, _ in sub}
    for op in sorted(ops):
        for b in (0, 9):
            mag = _magnitude(op, b, img.size)
            out = _apply_op(img, op, mag)
            assert out.size == img.size


def test_autoaugment_deterministic_given_rng():
    img = np.random.default_rng(2).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    a = autoaugment(img, np.random.default_rng(42))
    b = autoaugment(img, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)


def test_dead_leaves_pool_and_batches(tmp_path):
    pool = dead_leaves_pool(3, 96, seed=5, n_disks=30,
                            cache_dir=str(tmp_path))
    assert pool.shape == (3, 96, 96, 3) and pool.dtype == np.uint8
    # nontrivial content: edges exist
    assert pool.astype(np.int32).std() > 10
    # cache round-trip is exact
    again = dead_leaves_pool(3, 96, seed=5, n_disks=30,
                             cache_dir=str(tmp_path))
    np.testing.assert_array_equal(pool, again)
    batches = list(pool_batches(pool, 2, 64, 3, seed=0))
    assert len(batches) == 3
    for b in batches:
        # default uint8 (slim uploads; the train step normalizes on device)
        assert b.shape == (2, 64, 64, 3) and b.dtype == np.uint8
    fbatches = list(pool_batches(pool, 2, 64, 3, seed=0, as_float=True))
    for b, fb in zip(batches, fbatches):
        assert fb.dtype == np.float32
        assert 0.0 <= fb.min() and fb.max() <= 1.0
        # identical RNG stream: float batches are exactly uint8/255
        np.testing.assert_allclose(fb, b.astype(np.float32) / 255.0)


def test_freeze_masks_updates():
    import jax.numpy as jnp
    import optax

    from mlic_tpu.train.optimizers import freeze

    params = {"g_a": {"kernel": jnp.ones((3,))},
              "g_s": {"kernel": jnp.ones((3,))}}
    tx = freeze(optax.sgd(1.0), r"g_a")
    state = tx.init(params)
    grads = {"g_a": {"kernel": jnp.full((3,), 2.0)},
             "g_s": {"kernel": jnp.full((3,), 2.0)}}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["g_a"]["kernel"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["g_s"]["kernel"]), -2.0)


def test_imagefolder_autoaugment(tmp_path):
    from PIL import Image

    from mlic_tpu.data.folder import ImageFolderDataset

    rng = np.random.default_rng(3)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)).save(
            tmp_path / f"im{i}.png")
    ds = ImageFolderDataset(str(tmp_path), patch_size=64,
                            augment="autoaugment", seed=0)
    batch = ds.sample_batch(2)
    assert batch.shape == (2, 64, 64, 3)
    assert np.isfinite(batch).all()
