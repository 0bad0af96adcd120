"""NN layer primitives, NHWC / TPU-native (Flax linen).

Reimplements the reference's ``modules/layers/`` (conv factories, GDN
residual blocks, MLP — reference ``MLIC++/modules/layers/conv.py``,
``res_blk.py``, ``attention.py``) in channels-last layout so convolutions
map directly onto the MXU.  ``conv3x3`` defaults to depthwise-separable,
matching the fork's low-MAC variants (``conv.py:22-32``); pass
``depthwise=False`` for the dense-conv twins (the ``*_old`` modules).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlic_tpu.ops.math import lower_bound
from mlic_tpu.ops.pallas_fused_block import fused_block_tail, use_fused_blocks


class DepthwiseConv2D(nn.Module):
    """Depthwise kxk conv as k^2 shifted elementwise multiply-adds.

    XLA on this TPU lowers grouped (feature_group_count=C) convolutions
    pathologically at large spatial dims: 78 ms vs 5 ms for the shift
    decomposition at [8,128,192,96] (ROADMAP).  Parameters keep
    ``nn.Conv``'s names/shapes (kernel [k,k,1,C], bias [C]) so checkpoints
    and the reference converter are unaffected.  Padding is symmetric
    (torch parity); H and W are assumed divisible by the stride (latents
    are always even; images are padded to multiples of 64).
    """

    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.kernel_size
        s = self.stride
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, 1, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        dt = self.dtype or x.dtype
        h, w = x.shape[1], x.shape[2]
        ho, wo = h // s, w // s
        xp = jnp.pad(x, ((0, 0), (k // 2, k // 2), (k // 2, k // 2),
                         (0, 0))).astype(dt)
        kern = kernel.astype(dt)
        out = None
        for di in range(k):
            for dj in range(k):
                t = (xp[:, di:di + s * (ho - 1) + 1:s,
                        dj:dj + s * (wo - 1) + 1:s, :] * kern[di, dj, 0])
                out = t if out is None else out + t
        return out + bias.astype(dt)


class DepthwiseSeparableConv(nn.Module):
    """3x3 depthwise + 1x1 pointwise (reference ``conv.py:46-64``)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DepthwiseConv2D(self.kernel_size, self.stride, dtype=self.dtype,
                            name="depth")(x)
        x = PointwiseConv(self.features, dtype=self.dtype, name="point")(x)
        return x


class PointwiseConv(nn.Module):
    """1x1 convolution computed as a channel-axis dot.

    XLA on this TPU lowers (1,1) convolutions pathologically (~8x slower
    than the equivalent dot_general: 44 vs 5.6 ms for a 3-layer stack on
    [8,32,48,640] — see ROADMAP).  Parameters keep ``nn.Conv``'s exact
    names and shapes (kernel [1,1,Cin,Cout], bias [Cout]) so existing
    checkpoints and the reference-weight converter are unaffected.  A
    1x1 kernel never mixes spatial positions, so striding is plain
    subsampling.
    """

    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        if self.stride != 1:
            x = x[:, ::self.stride, ::self.stride, :]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        y = jnp.dot(x.astype(dt), kernel[0, 0].astype(dt))
        return y + bias.astype(dt)


def conv1x1(features: int, stride: int = 1, dtype=None, name=None) -> nn.Module:
    return PointwiseConv(features, stride, dtype=dtype, name=name)


def conv5x5(features: int, stride: int = 2, dtype=None, name=None) -> nn.Module:
    return nn.Conv(features, (5, 5), strides=(stride, stride),
                   padding=((2, 2), (2, 2)), dtype=dtype, name=name)


class Conv3x3(nn.Module):
    """conv3x3 factory: depthwise-separable by default (``conv.py:22-32``)."""

    features: int
    stride: int = 1
    depthwise: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        if self.depthwise:
            return DepthwiseSeparableConv(self.features, 3, self.stride,
                                          dtype=self.dtype, name="dw")(x)
        return nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)


def deconv5x5(features: int, stride: int = 2, dtype=None, name=None) -> nn.Module:
    """Transposed 5x5 conv (geometry of reference ``conv.py:35-44``)."""
    return nn.ConvTranspose(features, (5, 5), strides=(stride, stride),
                            padding="SAME", dtype=dtype, name=name)


class SubpelConv3x3(nn.Module):
    """3x3 conv to r^2x channels + pixel shuffle (compressai ``subpel_conv3x3``)."""

    features: int
    upscale: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        r = self.upscale
        x = nn.Conv(self.features * r * r, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        b, h, w, _ = x.shape
        # torch PixelShuffle channel order: (c, rh, rw)
        x = x.reshape(b, h, w, self.features, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # b h rh w rw c
        return x.reshape(b, h * r, w * r, self.features)


class GDN(nn.Module):
    """Generalized divisive normalization, channels-last.

    y_c = x_c / sqrt(beta_c + sum_d gamma_{cd} x_d^2)  (inverse: multiply).
    Nonnegativity via the sqrt-reparam + lower-bound trick so the parameters
    stay positive under unconstrained optimization.

    ``dtype=None`` (default) computes the whole norm in float32, casting a
    bf16 input in and out — numerically safest, but inserts two cast
    boundaries per block that break XLA fusion chains (measured 3.4x slower
    bf16 TRAINING on v5e, PARITY.md).  ``dtype=bfloat16`` is the mixed
    policy: the x^2 @ gamma contraction runs on the MXU with bf16 inputs
    and float32 accumulation (``preferred_element_type``), beta/rsqrt stay
    float32, and only the [B,H,W,C] normalizer is cast — no round trip on
    the activations themselves.
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: jnp.dtype | None = None
    _offset: float = 2.0 ** -18

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        c = x.shape[-1]
        ped = self._offset ** 2
        beta_bound = (self.beta_min + ped) ** 0.5
        gamma_bound = ped ** 0.5

        beta_raw = self.param("beta", lambda k, s: jnp.full(s, (1.0 + ped) ** 0.5), (c,))
        gamma_raw = self.param(
            "gamma", lambda k, s: jnp.sqrt(self.gamma_init * jnp.eye(c) + ped), (c, c))

        beta = lower_bound(beta_raw, beta_bound) ** 2 - ped
        gamma = lower_bound(gamma_raw, gamma_bound) ** 2 - ped

        if self.dtype is not None and x.dtype == self.dtype:
            norm = jnp.einsum("bhwd,dc->bhwc", jnp.square(x),
                              gamma.astype(self.dtype),
                              preferred_element_type=jnp.float32) + beta
            factor = jnp.sqrt(norm) if self.inverse else jax.lax.rsqrt(norm)
            return x * factor.astype(in_dtype)

        x = x.astype(jnp.float32)  # stable norm regardless of compute dtype
        norm = jnp.einsum("bhwd,dc->bhwc", jnp.square(x), gamma) + beta
        out = x * (jnp.sqrt(norm) if self.inverse else jax.lax.rsqrt(norm))
        return out.astype(in_dtype)


def _gdn_effective(gdn: "GDN", raw_beta, raw_gamma):
    """GDN's post-reparam (effective) gamma/beta, for the fused kernel."""
    ped = gdn._offset ** 2
    beta = lower_bound(raw_beta, (gdn.beta_min + ped) ** 0.5) ** 2 - ped
    gamma = lower_bound(raw_gamma, ped ** 0.5) ** 2 - ped
    return gamma, beta


def _fused_tail(mod: nn.Module, mid, skip, conv_name: str, act: str,
                gdn: "GDN | None" = None, gdn_name: str = ""):
    """The Pallas fused block tail for a residual block, or None.

    Opt-in (MLIC_FUSED_BLOCKS=1, codec/bench only — forward-only kernel),
    depthwise variants only, and only when the GDN dtype policy matches
    what the kernel computes (all-f32, or the bf16-mixed policy)."""
    if not (use_fused_blocks() and mod.depthwise
            and not mod.is_initializing()):
        return None
    if act != "gelu":
        policy_ok = ((gdn.dtype is None and mid.dtype == jnp.float32)
                     or gdn.dtype == mid.dtype)
        if not policy_ok:
            return None
    pr = mod.variables["params"]
    c2 = pr[conv_name]["dw"]
    gamma = beta = None
    if act != "gelu":
        gamma, beta = _gdn_effective(gdn, pr[gdn_name]["beta"],
                                     pr[gdn_name]["gamma"])
    return fused_block_tail(
        mid, skip, c2["depth"]["kernel"], c2["depth"]["bias"],
        c2["point"]["kernel"], c2["point"]["bias"], gamma, beta, act=act)


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) - GELU - conv3x3 - GDN + 1x1 strided skip
    (reference ``res_blk.py:62-93``)."""

    features: int
    stride: int = 2
    depthwise: bool = True
    dtype: jnp.dtype | None = None
    gdn_dtype: jnp.dtype | None = None  # bf16 = mixed-GDN policy

    @nn.compact
    def __call__(self, x):
        mid = Conv3x3(self.features, self.stride, self.depthwise,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.gelu(mid)
        out = Conv3x3(self.features, 1, self.depthwise, dtype=self.dtype,
                      name="conv2")(out)
        gdn = GDN(dtype=self.gdn_dtype, name="gdn")
        out = gdn(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv1x1(self.features, self.stride, dtype=self.dtype,
                        name="skip")(x)
        fused = _fused_tail(self, mid, x, "conv2", "gdn", gdn, "gdn")
        if fused is not None:
            return fused  # the flax tail above is dead code -> XLA DCE
        return out + x


class ResidualBlockUpsample(nn.Module):
    """subpel - GELU - conv3x3 - IGDN + subpel skip (``res_blk.py:96-121``)."""

    features: int
    upsample: int = 2
    depthwise: bool = True
    dtype: jnp.dtype | None = None
    gdn_dtype: jnp.dtype | None = None  # bf16 = mixed-GDN policy

    @nn.compact
    def __call__(self, x):
        mid = SubpelConv3x3(self.features, self.upsample, dtype=self.dtype,
                            name="subpel")(x)
        out = nn.gelu(mid)
        out = Conv3x3(self.features, 1, self.depthwise, dtype=self.dtype,
                      name="conv")(out)
        gdn = GDN(inverse=True, dtype=self.gdn_dtype, name="igdn")
        out = gdn(out)
        skip = SubpelConv3x3(self.features, self.upsample, dtype=self.dtype,
                             name="upsample")(x)
        fused = _fused_tail(self, mid, skip, "conv", "igdn", gdn, "igdn")
        if fused is not None:
            return fused
        return out + skip


class ResidualBlock(nn.Module):
    """conv3x3 - GELU - conv3x3 - GELU + skip (``res_blk.py:124-154``)."""

    features: int
    depthwise: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        mid = Conv3x3(self.features, 1, self.depthwise, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.gelu(mid)
        out = Conv3x3(self.features, 1, self.depthwise, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.gelu(out)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features, dtype=self.dtype, name="skip")(x)
        fused = _fused_tail(self, mid, x, "conv2", "gelu")
        if fused is not None:
            return fused
        return out + x


class ResidualBottleneck(nn.Module):
    """1x1 down - act - 3x3 - act - 1x1 up + skip (``res_blk.py:157-171``)."""

    features: int
    act: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        n = self.features
        out = conv1x1(n // 2, name="reduce")(x)
        out = self.act(out)
        out = nn.Conv(n // 2, (3, 3), padding="SAME", name="conv")(out)
        out = self.act(out)
        out = conv1x1(n, name="expand")(out)
        return x + out


class AttentionBlock(nn.Module):
    """Cheng'20 sigmoid-gated dual-branch attention (``res_blk.py:8-59``).

    Defined for parity; not used inside the MLIC++ transforms.
    """

    features: int
    depthwise: bool = True

    @nn.compact
    def __call__(self, x):
        n = self.features

        def unit(h, name):
            out = conv1x1(n // 2, name=f"{name}_in")(h)
            out = nn.gelu(out)
            out = Conv3x3(n // 2, 1, self.depthwise, name=f"{name}_mid")(out)
            out = nn.gelu(out)
            out = conv1x1(n, name=f"{name}_out")(out)
            return nn.gelu(h + out)

        a = x
        for i in range(3):
            a = unit(a, f"a{i}")
        b = x
        for i in range(3):
            b = unit(b, f"b{i}")
        b = conv1x1(n, name="b_proj")(b)
        return x + a * nn.sigmoid(b)


class MLP(nn.Module):
    """Linear - GELU - Linear (reference ``attention.py:8-25``; dropout elided
    — the reference always instantiates it with drop=0)."""

    hidden: int
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.features, name="fc2")(x)
