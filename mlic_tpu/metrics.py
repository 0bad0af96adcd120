"""Image quality metrics in pure JAX: PSNR, SSIM, MS-SSIM.

TPU-native replacement for the reference's pytorch-msssim / metric helpers
(``MLIC++/utils/metrics.py:13-53``).  MS-SSIM follows Wang et al. 2003
(5 scales, 11x11 Gaussian window, sigma 1.5) — the same construction
pytorch-msssim implements, so values are comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def _blur(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable valid-mode Gaussian blur, per channel. x: [B,H,W,C]."""
    c = x.shape[-1]
    k = kernel.shape[0]
    kh = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, c), ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def _ssim_components(a, b, kernel, data_range):
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _blur(a, kernel)
    mu_b = _blur(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # E[x^2] - mu^2 cancels catastrophically in f32 on constant regions
    # (variances come out slightly NEGATIVE, pushing cs above 1 — observed
    # ms-ssim 1.005 on dead-leaves images with large flat disks).  True
    # variances are nonnegative; clamp before forming the ratios.
    sigma_aa = jnp.maximum(_blur(a * a, kernel) - mu_aa, 0.0)
    sigma_bb = jnp.maximum(_blur(b * b, kernel) - mu_bb, 0.0)
    sigma_ab = _blur(a * b, kernel) - mu_ab
    # |cov| <= sqrt(var_a * var_b) (Cauchy-Schwarz; f32 rounding can break
    # it by a hair, which is exactly what makes cs exceed 1).
    bound = jnp.sqrt(sigma_aa * sigma_bb)
    sigma_ab = jnp.clip(sigma_ab, -bound, bound)
    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    kernel = _gaussian_kernel()
    s, _ = _ssim_components(a, b, kernel, data_range)
    return jnp.mean(s)


def _downsample2(x: jax.Array) -> jax.Array:
    """2x average-pool with symmetric pad to even dims (pytorch-msssim style)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        h, w = x.shape[1], x.shape[2]
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def ms_ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM over 5 scales; inputs [B,H,W,C], H,W >= 160."""
    kernel = _gaussian_kernel()
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    values = []
    for i in range(len(_MSSSIM_WEIGHTS)):
        s, cs = _ssim_components(a, b, kernel, data_range)
        values.append(jnp.mean(s if i == len(_MSSSIM_WEIGHTS) - 1 else cs))
        if i < len(_MSSSIM_WEIGHTS) - 1:
            a, b = _downsample2(a), _downsample2(b)
    values = jnp.stack(values)
    return jnp.prod(jnp.clip(values, 1e-6, 1.0) ** weights)
