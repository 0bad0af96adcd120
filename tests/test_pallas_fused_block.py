"""The fused residual-block tail kernel must reproduce the flax
composition (same op order: gelu -> 9-tap depthwise -> pointwise ->
GDN/IGDN/GELU -> +skip).  Runs in Mosaic interpret mode on the CPU CI
mesh; the same code path compiles natively on TPU (measured via
tools/microbench.py MB_SET=fusedblk)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlic_tpu.models.layers import (
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
)
from mlic_tpu.ops.pallas_fused_block import _HAVE_PALLAS, fused_block_tail

pytestmark = pytest.mark.skipif(not _HAVE_PALLAS, reason="pallas unavailable")


def _apply_both(monkeypatch, mod, x):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.delenv("MLIC_FUSED_BLOCKS", raising=False)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("MLIC_FUSED_BLOCKS", "1")
    with pltpu.force_tpu_interpret_mode():
        fused = mod.apply(params, x)
    return np.asarray(ref), np.asarray(fused)


def test_fused_rbs_matches_flax(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16, 8), jnp.float32)
    ref, fused = _apply_both(
        monkeypatch, ResidualBlockWithStride(features=16, stride=2), x)
    np.testing.assert_allclose(fused, ref, atol=1e-5, rtol=1e-5)


def test_fused_rb_matches_flax(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8, 16), jnp.float32)
    ref, fused = _apply_both(monkeypatch, ResidualBlock(features=16), x)
    np.testing.assert_allclose(fused, ref, atol=1e-5, rtol=1e-5)


def test_fused_upsample_matches_flax(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 12), jnp.float32)
    ref, fused = _apply_both(
        monkeypatch, ResidualBlockUpsample(features=12, upsample=2), x)
    np.testing.assert_allclose(fused, ref, atol=1e-5, rtol=1e-5)


def test_fused_rbs_bf16_mixed(monkeypatch):
    """bf16-mixed GDN policy: bf16 taps/matmuls, f32 accumulation."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 16, 8), jnp.bfloat16)
    mod = ResidualBlockWithStride(features=16, stride=2, dtype=jnp.bfloat16,
                                  gdn_dtype=jnp.bfloat16)
    ref, fused = _apply_both(monkeypatch, mod, x)
    np.testing.assert_allclose(fused.astype(np.float32),
                               ref.astype(np.float32), atol=0.05, rtol=0.05)


def test_fused_dense_blocks_fall_back(monkeypatch):
    """depthwise=False (dense-conv twins) must keep the flax path."""
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 8, 8), jnp.float32)
    mod = ResidualBlockWithStride(features=16, stride=2, depthwise=False)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("MLIC_FUSED_BLOCKS", "1")
    with pltpu.force_tpu_interpret_mode():
        out = mod.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_tail_shape_guard():
    """Non-tileable heights return None (caller falls back)."""
    mid = jnp.zeros((1, 7, 8, 4))  # 7 not divisible by any tile
    skip = jnp.zeros((1, 7, 8, 6))
    out = fused_block_tail(mid, skip,
                           jnp.zeros((3, 3, 1, 4)), jnp.zeros((4,)),
                           jnp.zeros((1, 1, 4, 6)), jnp.zeros((6,)),
                           act="gelu")
    assert out is None
