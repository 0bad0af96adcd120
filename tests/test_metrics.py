"""Metric sanity: PSNR/SSIM/MS-SSIM bounds and known values.

Regression for the f32 variance-cancellation bug: on images with large
constant regions (dead leaves), E[x^2]-mu^2 went slightly negative and
MS-SSIM came out ABOVE 1 (observed 1.005 in the r2 RD sweep).
"""

import jax.numpy as jnp
import numpy as np

from mlic_tpu.data.folder import dead_leaves_pool
from mlic_tpu.metrics import ms_ssim, psnr, ssim


def _pair(seed=0):
    img = dead_leaves_pool(1, 192, seed=seed, n_disks=40,
                           cache_dir="").astype(np.float32) / 255.0
    rng = np.random.default_rng(seed + 1)
    noisy = np.clip(img + rng.normal(0, 0.02, img.shape).astype(np.float32),
                    0, 1)
    return jnp.asarray(img), jnp.asarray(noisy)


def test_ms_ssim_bounded_on_flat_regions():
    a, b = _pair()
    v = float(ms_ssim(a, b))
    assert 0.0 < v <= 1.0, v
    s = float(ssim(a, b))
    assert 0.0 < s <= 1.0, s


def test_identical_images_are_perfect():
    a, _ = _pair(3)
    assert float(ms_ssim(a, a)) > 0.9999
    assert float(ssim(a, a)) > 0.9999
    assert float(psnr(a, a)) > 100.0


def test_quality_ordering():
    a, slightly = _pair(5)
    rng = np.random.default_rng(9)
    very = jnp.asarray(np.clip(np.asarray(a) + rng.normal(0, 0.2, a.shape)
                               .astype(np.float32), 0, 1))
    assert float(ms_ssim(a, slightly)) > float(ms_ssim(a, very))
    assert float(psnr(a, slightly)) > float(psnr(a, very))
