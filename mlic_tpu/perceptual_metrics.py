"""LPIPS and DISTS perceptual metrics (eval-side).

Reference: ``MLIC++/utils/metrics.py:13-53`` computes LPIPS (net="vgg") and
DISTS alongside PSNR/MS-SSIM.  Those packages wrap pretrained VGG16
backbones; this module rebuilds both metrics as flax modules:

* :class:`LPIPSVgg` — five VGG16 stages, channel-unit-normalized feature
  differences squared, learned 1x1 linear heads, spatial + stage sum
  (Zhang et al. 2018, the ``lpips`` pip package's vgg variant).
* :class:`DISTS` — VGG16 with L2-pooling instead of maxpool, six feature
  groups (input + 5 stages), global texture/structure statistics weighted by
  learned ``alpha``/``beta`` (Ding et al. 2020).

Pretrained weights cannot be downloaded in this environment; both classes
initialize randomly and expose loaders for locally provided torch
checkpoints (torchvision VGG16 ``features`` + the metric's own weight file).
Scores are only meaningful with real weights; shapes/determinism are tested
with random ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv widths per stage (through relu5_3).
_STAGES5 = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
            (512, 512, 512))

# LPIPS input normalization (lpips.ScalingLayer; inputs in [-1, 1]).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# DISTS input normalization (ImageNet mean/std; inputs in [0, 1]).
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Vgg16Stages(nn.Module):
    """VGG16 ``features`` trunk returning the post-relu end of each stage.

    ``l2_pool=True`` swaps maxpool for Hamming-windowed L2 pooling
    (DISTS); otherwise standard 2x2 maxpool (LPIPS).
    """

    l2_pool: bool = False

    @nn.compact
    def __call__(self, x):
        feats = []
        for si, widths in enumerate(_STAGES5):
            if si > 0:
                x = self._pool(x)
            for ci, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding="SAME",
                            name=f"conv{si+1}_{ci+1}")(x)
                x = nn.relu(x)
            feats.append(x)
        return feats

    def _pool(self, x):
        if not self.l2_pool:
            return nn.max_pool(x, (2, 2), strides=(2, 2))
        # L2 pooling: sqrt of Hamming^2-weighted average of x^2 (3x3, s2).
        win = np.hamming(3).astype(np.float32)
        k2 = np.outer(win, win)
        k2 = (k2 / k2.sum()).astype(np.float32)
        c = x.shape[-1]
        kern = jnp.tile(jnp.asarray(k2)[:, :, None, None], (1, 1, 1, c))
        y = jax.lax.conv_general_dilated(
            jnp.square(x), kern, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        return jnp.sqrt(jnp.maximum(y, 1e-12))


def _unit_normalize(f):
    return f * jax.lax.rsqrt(jnp.sum(jnp.square(f), -1, keepdims=True) + 1e-10)


class LPIPSVgg(nn.Module):
    """LPIPS distance with vgg backbone + learned linear heads."""

    @nn.compact
    def __call__(self, a, b):
        """a, b: [B,H,W,3] in [0,1]. Returns [B] distances."""
        shift = jnp.asarray(_LPIPS_SHIFT)
        scale = jnp.asarray(_LPIPS_SCALE)

        def norm_in(x):
            return ((2.0 * x - 1.0) - shift) / scale

        trunk = Vgg16Stages(name="vgg")
        fa = trunk(norm_in(a))
        fb = trunk(norm_in(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))
            w = self.param(f"lin{i}", nn.initializers.uniform(0.1),
                           (d.shape[-1], 1))
            # lpips clamps lin weights to >= 0 at load; mirror at use time.
            lane = jnp.einsum("bhwc,co->bhwo", d, jnp.maximum(w, 0.0))
            total = total + jnp.mean(lane, axis=(1, 2, 3))
        return total


class DISTS(nn.Module):
    """DISTS score: 1 - weighted structure/texture similarity."""

    @nn.compact
    def __call__(self, a, b):
        """a, b: [B,H,W,3] in [0,1]. Returns [B] scores (0 = identical)."""
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)

        def norm_in(x):
            return (x - mean) / std

        trunk = Vgg16Stages(l2_pool=True, name="vgg")
        fa = [norm_in(a)] + trunk(norm_in(a))
        fb = [norm_in(b)] + trunk(norm_in(b))
        chans = [f.shape[-1] for f in fa]
        alpha = self.param("alpha", nn.initializers.constant(0.1),
                           (sum(chans),))
        beta = self.param("beta", nn.initializers.constant(0.1),
                          (sum(chans),))
        w_sum = jnp.sum(alpha) + jnp.sum(beta)
        c1, c2 = 1e-6, 1e-6
        score = 0.0
        off = 0
        for xa, xb in zip(fa, fb):
            c = xa.shape[-1]
            al = alpha[off:off + c] / w_sum
            be = beta[off:off + c] / w_sum
            off += c
            mu_a = jnp.mean(xa, axis=(1, 2))
            mu_b = jnp.mean(xb, axis=(1, 2))
            var_a = jnp.mean(jnp.square(xa), (1, 2)) - jnp.square(mu_a)
            var_b = jnp.mean(jnp.square(xb), (1, 2)) - jnp.square(mu_b)
            cov = jnp.mean(xa * xb, (1, 2)) - mu_a * mu_b
            s_mean = (2.0 * mu_a * mu_b + c1) / (
                jnp.square(mu_a) + jnp.square(mu_b) + c1)
            s_var = (2.0 * cov + c2) / (var_a + var_b + c2)
            score = score + jnp.sum(al * s_mean + be * s_var, axis=-1)
        return 1.0 - score


def _load_vgg_trunk(sd, prefix: str = "") -> dict:
    """torchvision VGG16 ``features`` state_dict -> Vgg16Stages params."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = [f"conv{s+1}_{c+1}" for s, ws in enumerate(_STAGES5)
             for c in range(len(ws))]
    out = {}
    for name, idx in zip(names, conv_idx):
        w = np.asarray(sd[f"{prefix}{idx}.weight"]).transpose(2, 3, 1, 0)
        b = np.asarray(sd[f"{prefix}{idx}.bias"])
        out[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    return out


def load_lpips_weights(params: dict, vgg_features_path: str,
                       lpips_lin_path: str) -> dict:
    """Fill LPIPSVgg params from local torch files: torchvision vgg16
    ``features`` state_dict + the lpips package's ``vgg.pth`` lin heads
    (keys ``lin{i}.model.1.weight`` of shape [1, C, 1, 1])."""
    import torch

    vgg_sd = torch.load(vgg_features_path, map_location="cpu")
    vgg_sd = {k.removeprefix("features."): v.numpy()
              for k, v in vgg_sd.items() if k.startswith("features.")}
    lin_sd = torch.load(lpips_lin_path, map_location="cpu")
    out = dict(params)
    out["vgg"] = _load_vgg_trunk(vgg_sd)
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy()  # [1, C, 1, 1]
        out[f"lin{i}"] = jnp.asarray(w[:, :, 0, 0].T)  # [C, 1]
    return out


def load_dists_weights(params: dict, dists_path: str,
                       vgg_features_path: str | None = None) -> dict:
    """Fill DISTS params from the official ``weights.pt`` (keys ``alpha``,
    ``beta`` of shape [1, sum_C, 1, 1]); the VGG trunk loads separately from
    a torchvision vgg16 state_dict (the official repo builds its trunk from
    torchvision too, so the tensors are identical)."""
    import torch

    sd = torch.load(dists_path, map_location="cpu")
    out = dict(params)
    out["alpha"] = jnp.asarray(sd["alpha"].numpy().reshape(-1))
    out["beta"] = jnp.asarray(sd["beta"].numpy().reshape(-1))
    if vgg_features_path:
        vgg_sd = torch.load(vgg_features_path, map_location="cpu")
        vgg_sd = {k.removeprefix("features."): v.numpy()
                  for k, v in vgg_sd.items() if k.startswith("features.")}
        out["vgg"] = _load_vgg_trunk(vgg_sd)
    return out


def lpips_fn(params: dict):
    model = LPIPSVgg()
    return jax.jit(lambda a, b: model.apply({"params": params}, a, b))


def dists_fn(params: dict):
    model = DISTS()
    return jax.jit(lambda a, b: model.apply({"params": params}, a, b))


def init_lpips(rng=None) -> dict:
    model = LPIPSVgg()
    rng = rng if rng is not None else jax.random.key(0)
    x = jnp.zeros((1, 64, 64, 3))
    return model.init(rng, x, x)["params"]


def init_dists(rng=None) -> dict:
    model = DISTS()
    rng = rng if rng is not None else jax.random.key(0)
    x = jnp.zeros((1, 64, 64, 3))
    return model.init(rng, x, x)["params"]
