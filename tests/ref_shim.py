"""Minimal `compressai` (+`timm`/`einops` passthrough) shim so the REFERENCE
model classes instantiate on CPU torch for converter validation.

The reference (/root/reference/MLIC++, read-only) imports a handful of
compressai symbols (SURVEY.md §2.9).  compressai is not installed in this
environment, so this shim reproduces exactly the parameter/buffer NAMES,
SHAPES, INITIALIZERS, and forward math of the pieces the reference touches
(compressai 1.2.6 semantics re-derived from the published papers; see
mlic_tpu/entropy/models.py for the same derivations on the JAX side):

  * ``CompressionModel`` (creates ``entropy_bottleneck``)
  * ``EntropyBottleneck`` / ``EntropyBottleneckVbr`` (monotone-MLP prior:
    ``_matrix{k}``, ``_bias{k}``, ``_factor{k}``, ``quantiles``)
  * ``GaussianConditional`` (buffers only; analytic likelihood)
  * ``GDN`` (NonNegativeParametrizer sqrt-reparam ``beta``/``gamma``)
  * ``subpel_conv3x3``, ``conv3x3``, ``AttentionBlock``
  * ``quantize_ste``, ``LowerBound``
  * ``BufferedRansEncoder``/``RansDecoder`` stubs (never exercised here)

This lets the tests (a) extract the REAL key inventory of every reference
model variant and assert the converter consumes it with zero leftovers,
and (b) run the reference forward and compare against the converted flax
model — the strongest converter check possible without trained weights.
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF_ROOT = "/root/reference/MLIC++"


class LowerBound(nn.Module):
    def __init__(self, bound):
        super().__init__()
        self.register_buffer("bound", torch.tensor(float(bound)))

    def forward(self, x):
        return torch.clamp_min(x, self.bound)


def quantize_ste(x):
    return (torch.round(x) - x).detach() + x


class NonNegativeParametrizer(nn.Module):
    """Registers the same `pedestal` / `lower_bound.bound` buffers as
    compressai so state_dict key inventories are faithful."""

    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        super().__init__()
        pedestal = reparam_offset ** 2
        self.register_buffer("pedestal", torch.tensor([pedestal]))
        self.lower_bound = LowerBound((minimum + pedestal) ** 0.5)

    def init(self, x):
        return torch.sqrt(torch.clamp_min(x + self.pedestal, self.pedestal))

    def forward(self, x):
        return self.lower_bound(x) ** 2 - self.pedestal


class GDN(nn.Module):
    def __init__(self, in_channels, inverse=False, beta_min=1e-6,
                 gamma_init=0.1):
        super().__init__()
        self.inverse = inverse
        self.beta_reparam = NonNegativeParametrizer(minimum=beta_min)
        self.beta = nn.Parameter(self.beta_reparam.init(torch.ones(in_channels)))
        self.gamma_reparam = NonNegativeParametrizer()
        self.gamma = nn.Parameter(
            self.gamma_reparam.init(gamma_init * torch.eye(in_channels)))

    def forward(self, x):
        _, C, _, _ = x.size()
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma).reshape(C, C, 1, 1)
        norm = F.conv2d(x ** 2, gamma, beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


def subpel_conv3x3(in_ch, out_ch, r=1):
    return nn.Sequential(nn.Conv2d(in_ch, out_ch * r * r, 3, padding=1),
                         nn.PixelShuffle(r))


def conv3x3(in_ch, out_ch, stride=1):
    return nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)


class AttentionBlock(nn.Module):
    """Cheng'20 attention (imported by the reference's synthesis module but
    unused at runtime); parameters irrelevant — kept empty."""


class _EntropyModel(nn.Module):
    def __init__(self, likelihood_bound=1e-9):
        super().__init__()
        self.likelihood_lower_bound = LowerBound(likelihood_bound)
        self.register_buffer("_offset", torch.IntTensor())
        self.register_buffer("_quantized_cdf", torch.IntTensor())
        self.register_buffer("_cdf_length", torch.IntTensor())

    def quantize(self, inputs, mode, means=None):
        if mode == "noise":
            noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
            return inputs + noise
        outputs = inputs.clone()
        if means is not None:
            outputs -= means
        outputs = torch.round(outputs)
        if mode == "dequantize":
            if means is not None:
                outputs += means
            return outputs
        return outputs.int()


class EntropyBottleneck(_EntropyModel):
    def __init__(self, channels, tail_mass=1e-9, init_scale=10.0,
                 filters=(3, 3, 3, 3)):
        super().__init__()
        self.channels = channels
        self.filters = tuple(filters)
        f = (1,) + self.filters + (1,)
        scale = init_scale ** (1.0 / (len(self.filters) + 1))
        for k in range(len(self.filters) + 1):
            init = math.log(math.expm1(1.0 / scale / f[k + 1]))
            matrix = torch.full((channels, f[k + 1], f[k]), init)
            self.register_parameter(f"_matrix{k}", nn.Parameter(matrix))
            bias = torch.empty(channels, f[k + 1], 1).uniform_(-0.5, 0.5)
            self.register_parameter(f"_bias{k}", nn.Parameter(bias))
            if k < len(self.filters):
                self.register_parameter(
                    f"_factor{k}", nn.Parameter(torch.zeros(channels, f[k + 1], 1)))
        self.quantiles = nn.Parameter(
            torch.tensor([-init_scale, 0.0, init_scale]).repeat(channels, 1, 1))
        target = math.log(2.0 / tail_mass - 1.0)
        self.register_buffer("target", torch.tensor([-target, 0.0, target]))

    def _get_medians(self):
        return self.quantiles[:, :, 1:2]

    def _logits_cumulative(self, x, stop_gradient=False):
        for k in range(len(self.filters) + 1):
            m = getattr(self, f"_matrix{k}")
            b = getattr(self, f"_bias{k}")
            if stop_gradient:
                m, b = m.detach(), b.detach()
            x = torch.matmul(F.softplus(m), x) + b
            if k < len(self.filters):
                fac = getattr(self, f"_factor{k}")
                if stop_gradient:
                    fac = fac.detach()
                x = x + torch.tanh(fac) * torch.tanh(x)
        return x

    def _likelihood(self, v):
        lower = self._logits_cumulative(v - 0.5)
        upper = self._logits_cumulative(v + 0.5)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))

    def forward(self, x, training=None):
        if training is None:
            training = self.training
        # channel-major flatten like compressai
        perm = (1, 0) + tuple(range(2, x.ndim))
        vals = x.permute(*perm).contiguous()
        shape = vals.size()
        vals = vals.reshape(x.size(1), 1, -1)
        outputs = self.quantize(vals, "noise" if training else "dequantize",
                                self._get_medians())
        likelihood = self.likelihood_lower_bound(self._likelihood(outputs))
        outputs = outputs.reshape(shape).permute(*perm).contiguous()
        likelihood = likelihood.reshape(shape).permute(*perm).contiguous()
        return outputs, likelihood

    def update(self, force=False):
        return False

    def compress(self, *a, **k):
        raise NotImplementedError("shim: entropy coding not supported")

    decompress = compress

    def aux_loss(self):
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        return torch.abs(logits - self.target.reshape(1, 1, 3)).sum()


class EntropyBottleneckVbr(EntropyBottleneck):
    def forward(self, x, training=None, qs=None, ste=False):
        if qs is None:
            return super().forward(x, training)
        if training is None:
            training = self.training
        perm = (1, 0) + tuple(range(2, x.ndim))
        vals = x.permute(*perm).contiguous()
        shape = vals.size()
        vals = vals.reshape(x.size(1), 1, -1)
        medians = self._get_medians()
        if training:
            out = vals + torch.empty_like(vals).uniform_(-0.5, 0.5) * qs
        else:
            out = torch.round((vals - medians) / qs) * qs + medians
        half = qs / 2.0
        lower = self._logits_cumulative(out - half)
        upper = self._logits_cumulative(out + half)
        sign = -torch.sign(lower + upper).detach()
        lk = torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))
        lk = self.likelihood_lower_bound(lk)
        out = out.reshape(shape).permute(*perm).contiguous()
        lk = lk.reshape(shape).permute(*perm).contiguous()
        return out, lk

    def update_variable(self, force=False, qs=None):
        return False


class GaussianConditional(_EntropyModel):
    def __init__(self, scale_table=None, scale_bound=0.11, tail_mass=1e-9):
        super().__init__()
        self.tail_mass = tail_mass
        self.lower_bound_scale = LowerBound(scale_bound)
        self.register_buffer(
            "scale_table",
            torch.tensor(scale_table) if scale_table else torch.Tensor())

    def _standardized_cumulative(self, x):
        return 0.5 * torch.erfc(-(2 ** -0.5) * x)

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = self.lower_bound_scale(scales)
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def forward(self, inputs, scales, means=None, training=None):
        if training is None:
            training = self.training
        outputs = self.quantize(inputs, "noise" if training else "dequantize",
                                means)
        likelihood = self.likelihood_lower_bound(
            self._likelihood(outputs, scales, means))
        return outputs, likelihood

    def build_indexes(self, scales):
        scales = self.lower_bound_scale(scales)
        indexes = torch.full_like(scales, len(self.scale_table) - 1).int()
        for s in self.scale_table[:-1].flip(0):
            indexes -= (scales <= s).int()
        return indexes

    def update_scale_table(self, scale_table, force=False):
        return False


class CompressionModel(nn.Module):
    def __init__(self, entropy_bottleneck_channels, init_weights=None):
        super().__init__()
        self.entropy_bottleneck = EntropyBottleneck(entropy_bottleneck_channels)

    def aux_loss(self):
        return sum(m.aux_loss() for m in self.modules()
                   if isinstance(m, EntropyBottleneck))


class BufferedRansEncoder:
    def encode_with_indexes(self, *a):
        raise NotImplementedError("shim")

    def flush(self):
        raise NotImplementedError("shim")


class RansDecoder:
    def set_stream(self, *a):
        raise NotImplementedError("shim")

    def decode_stream(self, *a):
        raise NotImplementedError("shim")


def _to_2tuple(v):
    return v if isinstance(v, tuple) else (v, v)


def install():
    """Register the shim modules + reference path; idempotent."""
    if "compressai" not in sys.modules:
        pkg = types.ModuleType("compressai")
        models = types.ModuleType("compressai.models")
        models.CompressionModel = CompressionModel
        ops = types.ModuleType("compressai.ops")
        ops.quantize_ste = quantize_ste
        ops.LowerBound = LowerBound
        ops_ops = types.ModuleType("compressai.ops.ops")
        ops_ops.quantize_ste = quantize_ste
        ops.ops = ops_ops
        ans = types.ModuleType("compressai.ans")
        ans.BufferedRansEncoder = BufferedRansEncoder
        ans.RansDecoder = RansDecoder
        em = types.ModuleType("compressai.entropy_models")
        em.EntropyBottleneck = EntropyBottleneck
        em.EntropyBottleneckVbr = EntropyBottleneckVbr
        em.GaussianConditional = GaussianConditional
        em.EntropyModel = _EntropyModel
        layers = types.ModuleType("compressai.layers")
        layers.GDN = GDN
        layers.subpel_conv3x3 = subpel_conv3x3
        layers.conv3x3 = conv3x3
        layers.AttentionBlock = AttentionBlock
        pkg.models, pkg.ops, pkg.ans = models, ops, ans
        pkg.entropy_models, pkg.layers = em, layers
        for name, mod in [("compressai", pkg), ("compressai.models", models),
                          ("compressai.ops", ops), ("compressai.ops.ops", ops_ops),
                          ("compressai.ans", ans),
                          ("compressai.entropy_models", em),
                          ("compressai.layers", layers)]:
            sys.modules[name] = mod
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.to_2tuple = _to_2tuple
        tm.layers = tl
        timm.models = tm
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tl
    if "torchvision" not in sys.modules:
        # utils/utils.py imports ToPILImage at module scope (unused by the
        # model classes) — stub it so `models/__init__.py` imports cleanly.
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToPILImage = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def load_reference_model(name: str, tiny_overrides: dict | None = None,
                         vbr: bool = False, small_decoder: bool = False,
                         seed: int = 0):
    """Instantiate a reference model class (eval mode) on CPU.

    tiny_overrides lets tests shrink N/M/slice_num for speed while keeping
    the exact module topology.
    """
    install()
    torch.manual_seed(seed)
    # Reference configs (config/config.py:19-62) rebuilt locally — importing
    # the reference config module would pull torchvision (absent here).
    dims = {
        "MLICPP_L": (192, 320, 10),
        "MLICPP_S": (96, 160, 5),
        "MLICPP_S_VBR": (96, 160, 5),
        "MLICPP_M": (160, 256, 8),
        "MLICPP_S2": (128, 128, 2),
        "MLICPP_M_SMALL_DEC": (192, 320, 10),
        "MLICPP_M_SMALL_DEC_VBR": (192, 320, 10),
    }[name if not name.startswith("TINY") else "MLICPP_S"]
    cfg = types.SimpleNamespace(N=dims[0], M=dims[1], slice_num=dims[2],
                                context_window=5, act=nn.GELU)
    if tiny_overrides:
        for k, v in tiny_overrides.items():
            setattr(cfg, k, v)
    if small_decoder and vbr:
        from models.mlicpp_sd_vbr import MLICPlusPlusSDVbr as cls
    elif small_decoder:
        from models.mlicpp_small_decoder import MLICPlusPlusSD as cls
    elif vbr:
        from models.mlicpp_vbr import MLICPlusPlusVbr as cls
    else:
        from models.mlicpp import MLICPlusPlus as cls
    model = cls(cfg)
    model.eval()
    return model, cfg
