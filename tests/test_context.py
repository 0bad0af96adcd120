"""Context-module tests.

The LocalContext test reimplements the reference's masked unfold-window
attention semantics (``MLIC++/modules/transform/context.py:43-112``)
directly in numpy using the SAME flax parameters, and checks our
TPU formulation (static iota mask + window extraction + fused dense)
produces identical outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.models import context as ctx
from mlic_tpu.ops import math as om


def _naive_unfold(x, win):
    """Reference nn.Unfold semantics: [B,H,W,C] -> [B,H*W,win*win,C]."""
    b, h, w, c = x.shape
    p = (win - 1) // 2
    xp = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = np.zeros((b, h * w, win * win, c), x.dtype)
    for i in range(h):
        for j in range(w):
            for di in range(win):
                for dj in range(win):
                    out[:, i * w + j, di * win + dj] = xp[:, i + di, j + dj]
    return out


def test_extract_windows_matches_unfold():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    got = np.asarray(ctx.extract_windows(jnp.asarray(x), 5)).reshape(2, 48, 25, 3)
    want = _naive_unfold(x, 5)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_window_anchor_map_matches_unfolded_ckbd():
    h, w, win = 6, 8, 5
    m = np.zeros((1, h, w, 1), np.float32)
    m[0, 0::2, 1::2, 0] = 1
    m[0, 1::2, 0::2, 0] = 1
    want = _naive_unfold(m, win)[0, :, :, 0]
    got = np.asarray(ctx.window_anchor_map(h, w, win))
    np.testing.assert_array_equal(got, want)


def test_relative_position_index_is_swin():
    idx = ctx._relative_position_index(5)
    assert idx.shape == (25, 25)
    assert idx.min() == 0 and idx.max() == 80
    # center-to-center is the middle of the table
    assert idx[12, 12] == 40
    # symmetric pairs map to mirrored entries
    assert idx[0, 24] == 0 and idx[24, 0] == 80


def _local_context_numpy(params, x, win=5, heads=2):
    """Reference LocalContext forward in numpy (context.py:67-112 semantics),
    consuming our flax params."""
    b, h, w, c = x.shape
    L = h * w
    hd = c // heads
    scale = hd ** -0.5

    def layernorm(v, p):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-6) * p["scale"] + p["bias"]

    xn = layernorm(x.reshape(b, L, c), params["norm1"])
    qkv = xn @ params["qkv"]["kernel"] + params["qkv"]["bias"]  # [B,L,3C]
    qkv = qkv.reshape(b, h, w, 3, c)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    qw = _naive_unfold(q, win)  # [B,L,25,C]
    kw = _naive_unfold(k, win)
    vw = _naive_unfold(v, win)

    # checkerboard mask per reference: outer product of unfolded ckbd
    m = np.zeros((1, h, w, 1), np.float32)
    m[0, 0::2, 1::2, 0] = 1
    m[0, 1::2, 0::2, 0] = 1
    a = _naive_unfold(m, win)[0, :, :, 0]  # [L,25]
    mask = np.where(a[:, :, None] * a[:, None, :] > 0, 0.0, -100.0)

    rel = params["rel_pos_table"][ctx._relative_position_index(win).reshape(-1)]
    rel = rel.reshape(win * win, win * win, heads).transpose(2, 0, 1)

    out = np.zeros((b, L, win * win, c), np.float32)
    for hh in range(heads):
        qh = qw[..., hh * hd:(hh + 1) * hd] * scale
        kh = kw[..., hh * hd:(hh + 1) * hd]
        vh = vw[..., hh * hd:(hh + 1) * hd]
        attn = np.einsum("blid,bljd->blij", qh, kh)
        attn = attn + rel[hh][None, None] + mask[None]
        attn = attn - attn.max(-1, keepdims=True)
        attn = np.exp(attn)
        attn /= attn.sum(-1, keepdims=True)
        out[..., hh * hd:(hh + 1) * hd] = np.einsum("blij,bljd->blid", attn, vh)

    flat = out.reshape(b, L, win * win * c)
    fused = flat @ params["fusion"]["kernel"] + params["fusion"]["bias"]
    proj = fused @ params["proj"]["kernel"] + params["proj"]["bias"]
    z = layernorm(proj, params["norm2"])
    z = z @ params["mlp"]["fc1"]["kernel"] + params["mlp"]["fc1"]["bias"]
    # tanh-approx GELU not used: flax nn.gelu default is approximate=True
    z = 0.5 * z * (1 + np.tanh(np.sqrt(2 / np.pi) * (z + 0.044715 * z ** 3)))
    z = z @ params["mlp"]["fc2"]["kernel"] + params["mlp"]["fc2"]["bias"]
    return (proj + z).reshape(b, h, w, 2 * c)


def test_local_context_matches_reference_semantics():
    rng = np.random.default_rng(1)
    h, w, c = 6, 8, 8
    module = ctx.LocalContext(dim=c, window_size=5, num_heads=2)
    x_full = rng.standard_normal((2, h, w, c)).astype(np.float32)
    x = np.asarray(om.ckbd_anchor(jnp.asarray(x_full)))  # anchor-masked input
    params = jax.jit(module.init)(jax.random.key(0), jnp.asarray(x))["params"]
    got = np.asarray(jax.jit(module.apply)({"params": params}, jnp.asarray(x)))
    params_np = jax.tree.map(np.asarray, params)
    want = _local_context_numpy(params_np, x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_linear_intra_packed_equals_fullgrid():
    """Packed half-grid contraction == reference full-grid contraction
    (context.py:183-187): supports are disjoint so interleaved zeros drop."""
    rng = np.random.default_rng(2)
    b, h, w, c, heads = 2, 4, 6, 8, 2
    hd = c // heads
    q_sq = rng.standard_normal((b, h, w // 2, c)).astype(np.float32)
    k_sq = rng.standard_normal((b, h, w // 2, c)).astype(np.float32)
    v_sq = rng.standard_normal((b, h, w // 2, c)).astype(np.float32)

    # packed path (what the module does)
    packed = np.asarray(ctx._linear_attention(
        jnp.asarray(q_sq.reshape(b, -1, c)), jnp.asarray(k_sq.reshape(b, -1, c)),
        jnp.asarray(v_sq.reshape(b, -1, c)), heads))

    # reference path: softmax on squeezed, unsqueeze to full grid, contract
    def softmax(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    out_full = np.zeros((b, h, w, c), np.float32)
    k_f = np.asarray(om.ckbd_anchor_unsqueeze(jnp.asarray(
        softmax(k_sq.reshape(b, -1, c).reshape(b, h, w // 2, c), axis=(1, 2)[0])
    ))) if False else None
    # do it per-head exactly as reference context.py:179-187
    ksm = softmax(k_sq.reshape(b, h * w // 2, heads, hd), axis=1)
    qsm = softmax(q_sq.reshape(b, h * w // 2, heads, hd), axis=3)
    k_full = np.asarray(om.ckbd_anchor_unsqueeze(jnp.asarray(ksm.reshape(b, h, w // 2, c))))
    v_full = np.asarray(om.ckbd_anchor_unsqueeze(jnp.asarray(v_sq)))
    q_full = np.asarray(om.ckbd_nonanchor_unsqueeze(jnp.asarray(qsm.reshape(b, h, w // 2, c))))
    kf = k_full.reshape(b, h * w, heads, hd)
    vf = v_full.reshape(b, h * w, heads, hd)
    qf = q_full.reshape(b, h * w, heads, hd)
    ctx_mat = np.einsum("bnhd,bnhe->bhde", kf, vf)
    att = np.einsum("bhde,bnhd->bnhe", ctx_mat, qf).reshape(b, h, w, c)
    want = np.asarray(om.ckbd_nonanchor_squeeze(jnp.asarray(att))).reshape(b, -1, c)

    np.testing.assert_allclose(packed, want, rtol=1e-4, atol=1e-5)


def test_channel_context_shapes():
    m = ctx.ChannelContext(out_dim=16)
    x = jnp.zeros((1, 4, 4, 32))
    params = jax.jit(m.init)(jax.random.key(0), x)["params"]
    out = jax.jit(m.apply)({"params": params}, x)
    assert out.shape == (1, 4, 4, 64)


def test_global_inter_shapes():
    m = ctx.LinearGlobalInterContext(dim=32, out_dim=32, num_heads=2)
    x = jnp.zeros((1, 4, 6, 32))
    params = jax.jit(m.init)(jax.random.key(0), x)["params"]
    out = jax.jit(m.apply)({"params": params}, x)
    assert out.shape == (1, 4, 6, 32)


def test_global_intra_shapes_and_support():
    m = ctx.LinearGlobalIntraContext(dim=16, num_heads=2)
    x1 = jax.random.normal(jax.random.key(1), (1, 4, 6, 16))
    x2 = jax.random.normal(jax.random.key(2), (1, 4, 6, 16))
    params = jax.jit(m.init)(jax.random.key(0), x1, x2)["params"]
    out = jax.jit(m.apply)({"params": params}, x1, x2)
    assert out.shape == (1, 4, 6, 32)
