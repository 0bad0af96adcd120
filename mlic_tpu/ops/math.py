"""Core differentiable numerics for learned compression on TPU.

TPU-native reimplementation of the quantization / bound primitives the
reference gets from compressai (see reference ``MLIC++/utils/ckbd.py``,
compressai ``ops.quantize_ste`` / ``LowerBound`` usage at
``MLIC++/models/mlicpp.py:6``).  Everything here is pure JAX, NHWC layout,
static shapes, and safe under ``jax.jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# LowerBound: max(x, bound) with a straight-through-ish gradient.
# Gradient passes when x >= bound OR when the incoming gradient pushes x up
# (grad < 0 in the "minimize" convention used by compressai's LowerBound).
# ---------------------------------------------------------------------------
@jax.custom_vjp
def lower_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def quantize_ste(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (identity in backward)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def upper_bound(x: jax.Array, bound) -> jax.Array:
    return -lower_bound(-x, -jnp.asarray(bound, x.dtype))


# ---------------------------------------------------------------------------
# Checkerboard geometry (NHWC).
#
# Anchor positions are (even row, odd col) U (odd row, even col), i.e.
# (h + w) odd; non-anchor is the complement — matching the reference
# ``MLIC++/utils/ckbd.py:35-45``.  The squeeze/unsqueeze pair packs a
# checkerboard field into a dense [B, H, W//2, C] grid so downstream compute
# (attention / entropy coding) runs on half-size dense tensors instead of
# masked full-size ones.  W must be even (latents are image/16 with images
# padded to multiples of 64, so H and W are always even here).
# ---------------------------------------------------------------------------
def ckbd_mask(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """[H, W] mask, 1 at anchor positions ((h+w) odd)."""
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (((hh + ww) % 2) == 1).astype(dtype)


def ckbd_anchor(y: jax.Array) -> jax.Array:
    """Zero out non-anchor positions. y: [B, H, W, C]."""
    m = ckbd_mask(y.shape[1], y.shape[2], y.dtype)
    return y * m[None, :, :, None]


def ckbd_nonanchor(y: jax.Array) -> jax.Array:
    m = ckbd_mask(y.shape[1], y.shape[2], y.dtype)
    return y * (1.0 - m)[None, :, :, None]


def ckbd_split(y: jax.Array):
    return ckbd_anchor(y), ckbd_nonanchor(y)


def ckbd_merge(anchor: jax.Array, nonanchor: jax.Array) -> jax.Array:
    return anchor + nonanchor


def ckbd_anchor_squeeze(y: jax.Array) -> jax.Array:
    """Pack anchor checkerboard into dense grid. [B,H,W,C] -> [B,H,W//2,C].

    Row 2k of the output takes y[2k, 1::2]; row 2k+1 takes y[2k+1, 0::2].
    """
    even = y[:, 0::2, 1::2, :]  # [B, H//2, W//2, C]
    odd = y[:, 1::2, 0::2, :]
    b, h2, w2, c = even.shape
    out = jnp.stack([even, odd], axis=2)  # [B, H//2, 2, W//2, C]
    return out.reshape(b, h2 * 2, w2, c)


def ckbd_nonanchor_squeeze(y: jax.Array) -> jax.Array:
    even = y[:, 0::2, 0::2, :]
    odd = y[:, 1::2, 1::2, :]
    b, h2, w2, c = even.shape
    out = jnp.stack([even, odd], axis=2)
    return out.reshape(b, h2 * 2, w2, c)


def _interleave_cols(dense_cols: jax.Array, zeros_first: bool) -> jax.Array:
    """[B,H2,W2,C] -> [B,H2,W,C] interleaving zeros between columns."""
    z = jnp.zeros_like(dense_cols)
    if zeros_first:
        pair = jnp.stack([z, dense_cols], axis=3)  # [B,H2,W2,2,C]
    else:
        pair = jnp.stack([dense_cols, z], axis=3)
    b, h2, w2, _, c = pair.shape
    return pair.reshape(b, h2, w2 * 2, c)


def ckbd_anchor_unsqueeze(anchor: jax.Array) -> jax.Array:
    """[B,H,W//2,C] -> [B,H,W,C], inverse of ckbd_anchor_squeeze."""
    even = anchor[:, 0::2, :, :]  # goes to columns 1::2
    odd = anchor[:, 1::2, :, :]   # goes to columns 0::2
    even_f = _interleave_cols(even, zeros_first=True)
    odd_f = _interleave_cols(odd, zeros_first=False)
    b, h2, w, c = even_f.shape
    out = jnp.stack([even_f, odd_f], axis=2)  # [B,H//2,2,W,C]
    return out.reshape(b, h2 * 2, w, c)


def ckbd_nonanchor_unsqueeze(nonanchor: jax.Array) -> jax.Array:
    even = nonanchor[:, 0::2, :, :]  # goes to columns 0::2
    odd = nonanchor[:, 1::2, :, :]   # goes to columns 1::2
    even_f = _interleave_cols(even, zeros_first=False)
    odd_f = _interleave_cols(odd, zeros_first=True)
    b, h2, w, c = even_f.shape
    out = jnp.stack([even_f, odd_f], axis=2)
    return out.reshape(b, h2 * 2, w, c)
