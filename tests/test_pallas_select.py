"""The Pallas select_rows kernel must be bit-identical to ``table[row]``
(and therefore to the XLA compare+select chain) — it copies f32 scalars
with no arithmetic.  Runs in Mosaic interpret mode on the CPU CI mesh;
the same code path compiles natively on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlic_tpu.ops.pallas_select import _HAVE_PALLAS, select_rows_pallas


@pytest.mark.skipif(not _HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("shape", [(7, 333), (2, 64 * 64), (1956, 64)])
def test_pallas_select_matches_gather(shape):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((66, 6)).astype(np.float32))
    row = jnp.asarray(rng.integers(0, 66, shape).astype(np.int32))

    with pltpu.force_tpu_interpret_mode():
        cols = jax.jit(lambda r: select_rows_pallas(r, table))(row)
    expect = np.asarray(table)[np.asarray(row)]
    assert len(cols) == 6
    for j, c in enumerate(cols):
        np.testing.assert_array_equal(np.asarray(c), expect[..., j])


@pytest.mark.skipif(not _HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_select_inside_jit_trace():
    """select_rows_pallas must be traceable inside an outer jit (the codec
    embeds it mid-program) and exact for non-tile-aligned sizes."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    row = jnp.asarray(rng.integers(0, 5, (3, 1000)).astype(np.int32))

    @jax.jit
    def f(r):
        cols = select_rows_pallas(r, table)
        return sum(jnp.sum(c) for c in cols)

    with pltpu.force_tpu_interpret_mode():
        got = float(f(row))
    expect = float(np.asarray(table)[np.asarray(row)].sum())
    np.testing.assert_allclose(got, expect, rtol=1e-6)
