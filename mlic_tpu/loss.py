"""Rate-distortion losses (reference ``MLIC++/loss/rd_loss.py``).

``rate_distortion_loss`` is the workhorse (``rd_loss.py:24-59``):
bpp = sum(log2 likelihoods)/(-N·H·W), distortion per metric, and
loss = λ·255²·MSE + bpp (mse/charbonnier) or λ·(1−MS-SSIM) + bpp.
λ is a traced scalar so the VBR multi-rate trainer reuses one compiled
graph across levels (vs. the reference's mutable ``set_lmbda``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mlic_tpu.metrics import ms_ssim


def bpp_loss(likelihoods: dict, num_pixels: int) -> jax.Array:
    total = 0.0
    for lk in likelihoods.values():
        total = total + jnp.sum(jnp.log(lk)) / (-math.log(2) * num_pixels)
    return total


def charbonnier(x: jax.Array, y: jax.Array, eps: float = 1e-6) -> jax.Array:
    return jnp.mean(jnp.sqrt(jnp.square(x - y) + eps ** 2))


def rate_distortion_loss(output: dict, target: jax.Array, lmbda,
                         metric: str = "mse") -> dict:
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    out = {"bpp_loss": bpp_loss(output["likelihoods"], num_pixels)}
    if metric == "mse":
        out["mse_loss"] = jnp.mean(jnp.square(output["x_hat"] - target))
        out["loss"] = lmbda * 255.0 ** 2 * out["mse_loss"] + out["bpp_loss"]
    elif metric == "ms-ssim":
        out["ms_ssim_loss"] = 1.0 - ms_ssim(output["x_hat"], target, 1.0)
        out["loss"] = lmbda * out["ms_ssim_loss"] + out["bpp_loss"]
    elif metric == "charbonnier":
        out["charbonnier_loss"] = charbonnier(output["x_hat"], target)
        out["loss"] = lmbda * 255.0 ** 2 * out["charbonnier_loss"] + out["bpp_loss"]
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return out


def rate_distortion_loss_per_sample(output: dict, target: jax.Array, lmbda,
                                    metric: str = "mse") -> dict:
    """Per-sample variant for dataset statistics
    (reference ``rd_loss.py:61-98``, EXPTrainer)."""
    b, h, w, _ = target.shape
    num_pixels = h * w
    out = {}
    bpp = 0.0
    for lk in output["likelihoods"].values():
        bpp = bpp + jnp.sum(jnp.log(lk), axis=(1, 2, 3)) / (-math.log(2) * num_pixels)
    out["bpp_loss"] = bpp
    if metric == "mse":
        out["mse_loss"] = jnp.mean(jnp.square(output["x_hat"] - target), axis=(1, 2, 3))
        out["loss"] = lmbda * 255.0 ** 2 * out["mse_loss"] + out["bpp_loss"]
    else:
        raise ValueError("per-sample loss supports metric='mse'")
    return out
