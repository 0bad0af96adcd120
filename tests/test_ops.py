"""Tests for core ops: lower_bound gradients, STE, checkerboard geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from mlic_tpu.ops import math as om


def test_lower_bound_forward():
    x = jnp.array([-1.0, 0.05, 0.2, 3.0])
    np.testing.assert_allclose(om.lower_bound(x, 0.11), [0.11, 0.11, 0.2, 3.0])


def test_lower_bound_gradient():
    bound = 0.11

    def f(x):
        return jnp.sum(om.lower_bound(x, bound) ** 2)

    # Above bound: normal gradient 2x.
    g = jax.grad(f)(jnp.array([0.5]))
    np.testing.assert_allclose(g, [1.0], rtol=1e-6)
    # Below bound with positive incoming grad (pushing down): blocked.
    g = jax.grad(f)(jnp.array([0.05]))
    np.testing.assert_allclose(g, [0.0], atol=1e-7)
    # Below bound but gradient pushes up: passes.
    def f2(x):
        return jnp.sum(-om.lower_bound(x, bound))
    g = jax.grad(f2)(jnp.array([0.05]))
    np.testing.assert_allclose(g, [-1.0], rtol=1e-6)


def test_quantize_ste():
    x = jnp.array([0.4, 0.6, -1.2])
    np.testing.assert_allclose(om.quantize_ste(x), [0.0, 1.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(om.quantize_ste(v) * 3.0))(x)
    np.testing.assert_allclose(g, [3.0, 3.0, 3.0])


def _ref_mask(h, w):
    m = np.zeros((h, w))
    m[0::2, 1::2] = 1
    m[1::2, 0::2] = 1
    return m


def test_ckbd_mask_matches_reference_geometry():
    # Reference anchor geometry: (even row, odd col) U (odd row, even col)
    # (MLIC++/utils/ckbd.py:35-45).
    m = np.array(om.ckbd_mask(6, 8))
    np.testing.assert_array_equal(m, _ref_mask(6, 8))


def test_ckbd_split_merge_roundtrip():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 4, 6, 3)), dtype=jnp.float32)
    a, na = om.ckbd_split(y)
    np.testing.assert_allclose(om.ckbd_merge(a, na), y, rtol=1e-6)
    # disjoint support
    assert float(jnp.sum(jnp.abs(a * na))) == 0.0


def test_ckbd_squeeze_unsqueeze_roundtrip():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 6, 8, 5)), dtype=jnp.float32)
    a = om.ckbd_anchor(y)
    na = om.ckbd_nonanchor(y)
    sq_a = om.ckbd_anchor_squeeze(y)
    sq_na = om.ckbd_nonanchor_squeeze(y)
    assert sq_a.shape == (2, 6, 4, 5)
    np.testing.assert_allclose(om.ckbd_anchor_unsqueeze(sq_a), a, rtol=1e-6)
    np.testing.assert_allclose(om.ckbd_nonanchor_unsqueeze(sq_na), na, rtol=1e-6)


def test_ckbd_squeeze_matches_reference_layout():
    """Row 2k of anchor squeeze = y[2k, 1::2]; row 2k+1 = y[2k+1, 0::2]
    (reference MLIC++/utils/ckbd.py:47-59)."""
    rng = np.random.default_rng(2)
    y = rng.standard_normal((1, 4, 6, 2)).astype(np.float32)
    sq = np.array(om.ckbd_anchor_squeeze(jnp.asarray(y)))
    np.testing.assert_allclose(sq[0, 0], y[0, 0, 1::2])
    np.testing.assert_allclose(sq[0, 1], y[0, 1, 0::2])
    np.testing.assert_allclose(sq[0, 2], y[0, 2, 1::2])
    sq_na = np.array(om.ckbd_nonanchor_squeeze(jnp.asarray(y)))
    np.testing.assert_allclose(sq_na[0, 0], y[0, 0, 0::2])
    np.testing.assert_allclose(sq_na[0, 1], y[0, 1, 1::2])
