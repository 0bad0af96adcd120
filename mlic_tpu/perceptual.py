"""Perceptual losses: VGG features, style (Gram), hinge GAN, POELIC RD loss.

Reference: ``MLIC++/loss/rd_loss.py:101-260`` (GANLoss, StyleLoss,
RateDistortionPOELICLoss) and ``models/vgg.py:5-37`` (4-stage VGG16 feature
extractor).  The reference loads torchvision's pretrained VGG16; this
environment has no network egress, so ``Vgg16Features`` initializes randomly
unless ``load_torch_vgg16`` is given a local torchvision checkpoint — the
loss plumbing and training path are identical either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlic_tpu.loss import bpp_loss, charbonnier

# VGG16 conv layout per stage (through relu1_2, relu2_2, relu3_3, relu4_3)
_VGG_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512))


class Vgg16Features(nn.Module):
    """First four VGG16 stages; returns [relu1_2, relu2_2, relu3_3, relu4_3]."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for si, widths in enumerate(_VGG_STAGES):
            for ci, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding="SAME", name=f"conv{si+1}_{ci+1}")(x)
                x = nn.relu(x)
            feats.append(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def load_torch_vgg16(params: dict, state_dict_path: str) -> dict:
    """Map a torchvision VGG16 ``features`` state_dict into Vgg16Features
    params (OIHW -> HWIO)."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    # torchvision features indices of the conv layers in order
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    names = [f"conv{s+1}_{c+1}" for s, ws in enumerate(_VGG_STAGES)
             for c in range(len(ws))]
    out = dict(params)
    for name, idx in zip(names, conv_idx):
        w = sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{idx}.bias"].numpy()
        out[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    return out


def gram_matrix(feat: jax.Array) -> jax.Array:
    """[B,H,W,C] -> normalized Gram [B,C,C] (StyleLoss, ``rd_loss.py:180-196``)."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


def style_loss(feats_a, feats_b) -> jax.Array:
    return sum(jnp.mean(jnp.square(gram_matrix(a) - gram_matrix(b)))
               for a, b in zip(feats_a, feats_b))


def perceptual_l2(feats_a, feats_b) -> jax.Array:
    """Unit-normalized feature distance (LPIPS-style, unweighted)."""
    total = 0.0
    for a, b in zip(feats_a, feats_b):
        an = a * jax.lax.rsqrt(jnp.sum(jnp.square(a), -1, keepdims=True) + 1e-10)
        bn = b * jax.lax.rsqrt(jnp.sum(jnp.square(b), -1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.square(an - bn))
    return total


def gan_loss_hinge(logits: jax.Array, target_is_real: bool,
                   for_discriminator: bool = True) -> jax.Array:
    """Hinge GAN loss (``rd_loss.py:101-177`` 'hinge' mode)."""
    if for_discriminator:
        if target_is_real:
            return jnp.mean(nn.relu(1.0 - logits))
        return jnp.mean(nn.relu(1.0 + logits))
    return -jnp.mean(logits)


def image_to_patches(x: jax.Array, patch: int = 16) -> jax.Array:
    """[B,H,W,C] -> [B*nh*nw, patch, patch, C] (``utils/func.py:122-138``)."""
    b, h, w, c = x.shape
    nh, nw = h // patch, w // patch
    x = x[:, :nh * patch, :nw * patch, :]
    x = x.reshape(b, nh, patch, nw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, patch, patch, c)


def rate_distortion_poelic_loss(output: dict, target: jax.Array, lmbda,
                                vgg_apply, vgg_params,
                                style_weight: float = 100.0) -> dict:
    """Perceptual RD loss (``rd_loss.py:199-260``): Charbonnier + perceptual
    feature distance + style over 16x16 patches + bpp."""
    b, h, w, _ = target.shape
    out = {"bpp_loss": bpp_loss(output["likelihoods"], b * h * w)}
    x_hat = output["x_hat"]
    out["charbonnier_loss"] = charbonnier(x_hat, target)
    fa = vgg_apply(vgg_params, x_hat)
    fb = vgg_apply(vgg_params, target)
    out["perceptual_loss"] = perceptual_l2(fa, fb)
    pa = vgg_apply(vgg_params, image_to_patches(x_hat))
    pb = vgg_apply(vgg_params, image_to_patches(target))
    out["style_loss"] = style_loss(pa, pb)
    out["loss"] = (lmbda * 255.0 ** 2 * out["charbonnier_loss"]
                   + out["perceptual_loss"] + style_weight * out["style_loss"]
                   + out["bpp_loss"])
    return out
