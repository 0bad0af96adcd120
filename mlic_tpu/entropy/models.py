"""Entropy models: factorized prior (EntropyBottleneck) + GaussianConditional.

TPU-native reimplementation of the two entropy models the reference uses from
compressai (reference ``MLIC++/models/mlicpp.py:5-7,36,96-98``; SURVEY.md §2.9).
Device side is pure JAX (likelihoods, quantization, index building — all
jittable, NHWC); table construction (``update``) runs on host once per
checkpoint and feeds the native rANS coder.

Semantics re-derived from the published constructions:
  * Ballé et al. 2018 "Variational image compression with a scale hyperprior"
    (factorized prior: per-channel monotone MLP CDF with learned quantiles).
  * Minnen et al. 2018 (conditional Gaussian with a quantized scale table).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlic_tpu.entropy.cdf import build_cdf_tables, get_scale_table
from mlic_tpu.ops.math import lower_bound, quantize_ste

_SQRT2 = math.sqrt(2.0)
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def std_gaussian_cdf(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc (stable in both tails)."""
    return 0.5 * jax.lax.erfc(-x / _SQRT2)


def gaussian_likelihood(y: jax.Array, scales: jax.Array, means: jax.Array,
                        scale_bound: float = 0.11) -> jax.Array:
    """P(round(y) | N(means, scales^2)) with the +-1/2 integration window."""
    scales = lower_bound(scales, jnp.asarray(scale_bound, scales.dtype))
    values = jnp.abs(y - means)
    upper = std_gaussian_cdf((0.5 - values) / scales)
    lower = std_gaussian_cdf((-0.5 - values) / scales)
    return lower_bound(upper - lower, jnp.asarray(LIKELIHOOD_BOUND, y.dtype))


def build_indexes(scales: jax.Array, scale_table: jax.Array,
                  scale_bound: float = 0.11) -> jax.Array:
    """Map each scale to the smallest table entry >= scale (jittable).

    Matches the reference semantics (count of strictly-smaller table entries,
    compressai ``GaussianConditional.build_indexes``).
    """
    scales = lower_bound(scales, jnp.asarray(scale_bound, scales.dtype))
    return jnp.searchsorted(scale_table[:-1], scales, side="left").astype(jnp.int32)


@dataclasses.dataclass
class GaussianConditionalTables:
    """Host-side quantized CDF tables for the conditional Gaussian coder."""

    scale_table: np.ndarray
    quantized_cdf: np.ndarray  # [n_scales, max_len + 2] int32
    cdf_length: np.ndarray     # [n_scales] int32
    offset: np.ndarray         # [n_scales] int32

    @classmethod
    def create(cls, scale_table: np.ndarray | None = None,
               tail_mass: float = TAIL_MASS) -> "GaussianConditionalTables":
        if scale_table is None:
            scale_table = get_scale_table()
        scale_table = np.asarray(scale_table, dtype=np.float64)
        # Half-width of the coded support per scale: P(|X| > width) <= tail_mass.
        from scipy import stats  # SciPy ships with the baked-in torch stack.
        multiplier = -stats.norm.ppf(tail_mass / 2)
        centers = np.ceil(scale_table * multiplier).astype(np.int64)
        pmf_lengths = 2 * centers + 1
        max_length = int(pmf_lengths.max())
        samples = np.abs(np.arange(max_length)[None, :] - centers[:, None])
        upper = stats.norm.cdf((0.5 - samples) / scale_table[:, None])
        lower = stats.norm.cdf((-0.5 - samples) / scale_table[:, None])
        pmfs = upper - lower
        tail = 2 * lower[:, 0]
        cdfs, lengths = build_cdf_tables(pmfs, pmf_lengths, tail, max_length)
        return cls(scale_table=scale_table.astype(np.float32),
                   quantized_cdf=cdfs, cdf_length=lengths,
                   offset=(-centers).astype(np.int32))

    def to_state(self) -> dict:
        return {
            "scale_table": self.scale_table,
            "quantized_cdf": self.quantized_cdf,
            "cdf_length": self.cdf_length,
            "offset": self.offset,
        }

    @classmethod
    def from_state(cls, state: dict) -> "GaussianConditionalTables":
        return cls(**{k: np.asarray(v) for k, v in state.items()})


class EntropyBottleneck(nn.Module):
    """Learned factorized prior over the hyper-latent z (per-channel density).

    The per-channel CDF is a monotone MLP: K+1 affine layers with softplus-
    positive matrices, tanh gating between layers, sigmoid readout.  Learned
    ``quantiles`` track the (tail, median, 1-tail) points and are trained by
    the auxiliary loss only (density params are stop-gradded there), mirroring
    the main/aux optimizer split of the reference
    (``MLIC++/utils/optimizers.py:6-45``).
    """

    channels: int
    filters: Sequence[int] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = TAIL_MASS

    def setup(self):
        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        self._n_layers = len(self.filters) + 1

        def matrix_init(key, shape, dtype=jnp.float32):
            d_out = shape[1]
            init = math.log(math.expm1(1.0 / scale / d_out))
            return jnp.full(shape, init, dtype)

        matrices, biases, factors = [], [], []
        for k in range(self._n_layers):
            matrices.append(self.param(f"matrix_{k}", matrix_init,
                                       (self.channels, f[k + 1], f[k])))
            biases.append(self.param(
                f"bias_{k}",
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -0.5, 0.5),
                (self.channels, f[k + 1], 1)))
            if k < self._n_layers - 1:
                factors.append(self.param(f"factor_{k}", nn.initializers.zeros,
                                          (self.channels, f[k + 1], 1)))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        def quantile_init(key, shape, dtype=jnp.float32):
            q = jnp.array([-self.init_scale, 0.0, self.init_scale], dtype)
            return jnp.tile(q[None, None, :], (self.channels, 1, 1))

        self.quantiles = self.param("quantiles", quantile_init,
                                    (self.channels, 1, 3))

    def _logits_cumulative(self, x: jax.Array, stop_gradient: bool) -> jax.Array:
        """x: [C, 1, L] -> logits [C, 1, L]."""
        for k in range(self._n_layers):
            m, b = self._matrices[k], self._biases[k]
            if stop_gradient:
                m, b = jax.lax.stop_gradient(m), jax.lax.stop_gradient(b)
            x = jnp.einsum("coi,cil->col", jax.nn.softplus(m), x) + b
            if k < self._n_layers - 1:
                fac = self._factors[k]
                if stop_gradient:
                    fac = jax.lax.stop_gradient(fac)
                x = x + jnp.tanh(fac) * jnp.tanh(x)
        return x

    def _likelihood(self, v: jax.Array) -> jax.Array:
        """v: [C, L] values (already channel-major) -> likelihoods [C, L]."""
        lower = self._logits_cumulative(v[:, None, :] - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(v[:, None, :] + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        lk = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return lk[:, 0, :]

    def medians(self) -> jax.Array:
        return self.quantiles[:, 0, 1]

    def __call__(self, z: jax.Array, training: bool = True):
        """z: [B, H, W, C] -> (z_tilde, likelihoods) both [B, H, W, C]."""
        b, h, w, c = z.shape
        zc = jnp.transpose(z.reshape(b * h * w, c))  # [C, L]
        medians = self.medians()[:, None]
        if training:
            key = self.make_rng("noise")
            noise = jax.random.uniform(key, zc.shape, zc.dtype, -0.5, 0.5)
            v = zc + noise
        else:
            v = jnp.round(zc - medians) + medians
        lk = lower_bound(self._likelihood(v), jnp.asarray(LIKELIHOOD_BOUND, z.dtype))
        out = jnp.transpose(v).reshape(b, h, w, c)
        lk = jnp.transpose(lk).reshape(b, h, w, c)
        return out, lk

    def ste_quantize(self, z: jax.Array) -> jax.Array:
        """STE round-to-medians; the z_hat path of the reference
        (``MLIC++/models/mlicpp.py:96-98``)."""
        medians = self.medians().reshape(1, 1, 1, -1)
        return quantize_ste(z - medians) + medians

    def aux_loss(self) -> jax.Array:
        """Trains quantiles to hit (tail/2, 1/2, 1 - tail/2) of the CDF."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2.0 / self.tail_mass - 1.0)
        target = jnp.array([-t, 0.0, t], logits.dtype).reshape(1, 1, 3)
        return jnp.sum(jnp.abs(logits - target))


class EntropyBottleneckVbr(EntropyBottleneck):
    """Factorized prior with a variable quantization step ``qs``.

    Reference: ``EntropyBottleneckVbr`` used by the VBR model when
    ``vr_entbttlnck=True`` (``mlicpp_vbr.py:104-117``): the hyper-latent is
    quantized with step ``qs`` derived from the gain (``gayn2zqstep`` MLP,
    lower-bounded at 0.5) and likelihoods integrate the density over
    ``±qs/2`` around the quantized value.
    """

    def quantize_variable(self, z: jax.Array, qs) -> jax.Array:
        """STE round to a qs-grid around the channel medians."""
        medians = self.medians().reshape(1, 1, 1, -1)
        return quantize_ste((z - medians) / qs) * qs + medians

    def __call__(self, z: jax.Array, training: bool = True, qs=None):
        if qs is None:
            return super().__call__(z, training)
        qs = jnp.asarray(qs, z.dtype)
        b, h, w, c = z.shape
        zc = jnp.transpose(z.reshape(b * h * w, c))  # [C, L]
        medians = self.medians()[:, None]
        if training:
            key = self.make_rng("noise")
            noise = jax.random.uniform(key, zc.shape, zc.dtype, -0.5, 0.5) * qs
            v = zc + noise
        else:
            v = jnp.round((zc - medians) / qs) * qs + medians
        half = qs / 2.0
        lower = self._logits_cumulative(v[:, None, :] - half, stop_gradient=False)
        upper = self._logits_cumulative(v[:, None, :] + half, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        lk = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))[:, 0, :]
        lk = lower_bound(lk, jnp.asarray(LIKELIHOOD_BOUND, z.dtype))
        out = jnp.transpose(v).reshape(b, h, w, c)
        return out, jnp.transpose(lk).reshape(b, h, w, c)


def entropy_bottleneck_tables(eb_params: dict, channels: int,
                              filters: Sequence[int] = (3, 3, 3, 3),
                              tail_mass: float = TAIL_MASS,
                              qs: float = 1.0):
    """Host-side CDF table construction for the factorized prior.

    Equivalent of compressai ``EntropyBottleneck.update()`` reached by the
    reference's per-epoch ``net.update(force=True)``
    (``MLIC++/playground/train.py:228-233``).  ``qs != 1`` builds tables for
    a variable quantization step (``EntropyBottleneckVbr.update_variable``,
    reference ``mlicpp_vbr.py:1168-1183``): symbols live on the grid
    ``median + k*qs`` and each slot integrates the density over ``±qs/2``.

    Args:
      eb_params: the flax param dict of an ``EntropyBottleneck`` module.
    Returns:
      (quantized_cdf [C, max+2] int32, cdf_length [C], offset [C], medians [C] f32)
    """
    eb_params = jax.device_get(eb_params)  # one batched transfer
    qs = float(qs)

    quantiles = np.asarray(eb_params["quantiles"], np.float32)
    medians = quantiles[:, 0, 1]
    minima = np.maximum(
        np.ceil((medians - quantiles[:, 0, 0]) / qs).astype(np.int64), 0)
    maxima = np.maximum(
        np.ceil((quantiles[:, 0, 2] - medians) / qs).astype(np.int64), 0)
    pmf_lengths = minima + maxima + 1
    max_length = int(pmf_lengths.max())

    # Sample the density at qs-grid offsets around the median.  The monotone
    # MLP is evaluated in float32 numpy on host — tables are host artifacts
    # shared by encoder and decoder, so no device math is involved.
    samples = ((np.arange(max_length)[None, :] - minima[:, None]) * qs
               + medians[:, None]).astype(np.float32)[:, None, :]  # [C,1,L]

    n_layers = len(filters) + 1

    def softplus(v):
        return np.logaddexp(0.0, v)

    def logits_np(x):
        x = x.astype(np.float32)
        for k in range(n_layers):
            m = softplus(np.asarray(eb_params[f"matrix_{k}"], np.float32))
            b = np.asarray(eb_params[f"bias_{k}"], np.float32)
            x = np.einsum("coi,cil->col", m, x) + b
            if k < n_layers - 1:
                fac = np.asarray(eb_params[f"factor_{k}"], np.float32)
                x = x + np.tanh(fac) * np.tanh(x)
        return x

    def sigmoid(v):
        return 0.5 * (1.0 + np.tanh(0.5 * v))

    lower = sigmoid(logits_np(samples - 0.5 * qs))[:, 0, :]
    upper = sigmoid(logits_np(samples + 0.5 * qs))[:, 0, :]
    pmfs = upper - lower
    # Tail mass on both sides of the support.
    tail = lower[np.arange(len(medians)), 0] + (
        1.0 - upper[np.arange(len(medians)), pmf_lengths - 1])
    cdfs, lengths = build_cdf_tables(pmfs, pmf_lengths, tail, max_length)
    offsets = (-minima).astype(np.int32)
    return cdfs, lengths, offsets, medians.astype(np.float32)
