"""Analysis / synthesis transforms (g_a, g_s, h_a, h_s), NHWC.

Mirrors the reference stacks (``MLIC++/modules/transform/analysis.py:6-48``,
``synthesis.py:9-73``): stride-16 conv-GDN residual analysis, stride-4 hyper
pair, subpel-upsampling synthesis.  ``depthwise=True`` (default) is the
fork's depthwise-separable variant; ``depthwise=False`` reproduces the
``*_old`` dense-conv twins used by the published MLIC++ weights.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mlic_tpu.models.layers import (
    Conv3x3,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
)


class AnalysisTransform(nn.Module):
    """g_a: image [B,H,W,3] -> latent [B,H/16,W/16,M] (``analysis.py:6-22``).

    ``dtype`` selects the compute precision (bf16 on TPU halves MXU time);
    the output is always cast back to float32 — the latent feeds the
    float32 quantization/entropy path."""

    N: int
    M: int
    depthwise: bool = True
    dtype: jnp.dtype | None = None
    gdn_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dw, dt, gdt = self.depthwise, self.dtype, self.gdn_dtype
        if dt is not None:
            x = x.astype(dt)
        x = ResidualBlockWithStride(self.N, 2, dw, dtype=dt, gdn_dtype=gdt,
                                    name="rbs0")(x)
        x = ResidualBlock(self.N, dw, dtype=dt, name="rb0")(x)
        x = ResidualBlockWithStride(self.N, 2, dw, dtype=dt, gdn_dtype=gdt,
                                    name="rbs1")(x)
        x = ResidualBlock(self.N, dw, dtype=dt, name="rb1")(x)
        x = ResidualBlockWithStride(self.N, 2, dw, dtype=dt, gdn_dtype=gdt,
                                    name="rbs2")(x)
        x = ResidualBlock(self.N, dw, dtype=dt, name="rb2")(x)
        x = Conv3x3(self.M, 2, dw, dtype=dt, name="out")(x)
        return x.astype(jnp.float32)


class HyperAnalysis(nn.Module):
    """h_a: latent -> hyper-latent, stride 4 (``analysis.py:25-48``)."""

    M: int
    N: int
    depthwise: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dw, dt = self.depthwise, self.dtype
        if dt is not None:
            x = x.astype(dt)
        x = Conv3x3(self.N, 1, dw, dtype=dt, name="c0")(x)
        x = nn.gelu(x)
        x = Conv3x3(self.N, 1, dw, dtype=dt, name="c1")(x)
        x = nn.gelu(x)
        x = Conv3x3(self.N, 2, dw, dtype=dt, name="c2")(x)
        x = nn.gelu(x)
        x = Conv3x3(self.N, 1, dw, dtype=dt, name="c3")(x)
        x = nn.gelu(x)
        x = Conv3x3(self.N, 2, dw, dtype=dt, name="c4")(x)
        return x.astype(jnp.float32)


class HyperSynthesis(nn.Module):
    """h_s: z_hat [B,h/4,w/4,N] -> hyper params [B,h,w,2M] (``synthesis.py:9-33``)."""

    M: int
    N: int
    depthwise: bool = True

    @nn.compact
    def __call__(self, x):
        dw = self.depthwise
        x = Conv3x3(self.M, 1, dw, name="c0")(x)
        x = nn.gelu(x)
        x = SubpelConv3x3(self.M, 2, name="up0")(x)
        x = nn.gelu(x)
        x = Conv3x3(self.M * 3 // 2, 1, dw, name="c1")(x)
        x = nn.gelu(x)
        x = SubpelConv3x3(self.M * 3 // 2, 2, name="up1")(x)
        x = nn.gelu(x)
        x = Conv3x3(self.M * 2, 1, dw, name="c2")(x)
        return x


class SynthesisTransform(nn.Module):
    """g_s: latent -> image (``synthesis.py:56-73``).

    ``old_head=True`` reproduces ``SynthesisTransformOld`` (first block maps
    M->N instead of M->M; needed for pre-Sept-2023 reference weights,
    ``synthesis.py:36-53``).  ``dtype`` as in AnalysisTransform; g_s sits
    after the entropy loop so bf16 never affects bitstream determinism.
    """

    N: int
    M: int
    depthwise: bool = True
    old_head: bool = False
    dtype: jnp.dtype | None = None
    gdn_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dw, dt, gdt = self.depthwise, self.dtype, self.gdn_dtype
        if dt is not None:
            x = x.astype(dt)
        head = self.N if self.old_head else self.M
        x = ResidualBlock(head, dw, dtype=dt, name="rb0")(x)
        x = ResidualBlockUpsample(self.N, 2, dw, dtype=dt, gdn_dtype=gdt,
                                  name="up0")(x)
        x = ResidualBlock(self.N, dw, dtype=dt, name="rb1")(x)
        x = ResidualBlockUpsample(self.N, 2, dw, dtype=dt, gdn_dtype=gdt,
                                  name="up1")(x)
        x = ResidualBlock(self.N, dw, dtype=dt, name="rb2")(x)
        x = ResidualBlockUpsample(self.N, 2, dw, dtype=dt, gdn_dtype=gdt,
                                  name="up2")(x)
        x = ResidualBlock(self.N, dw, dtype=dt, name="rb3")(x)
        x = SubpelConv3x3(3, 2, dtype=dt, name="out")(x)
        return x.astype(jnp.float32)
