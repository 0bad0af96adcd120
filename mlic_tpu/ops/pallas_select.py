"""Pallas TPU kernel: tiny-table row lookup as a VPU select chain.

``table[row]`` per column, for tables of a few dozen rows (the codec's
per-row entropy constants: reference semantics of the per-scale CDF row
lookup, ``/root/reference/MLIC++/models/mlicpp.py:420-447`` — re-designed
for TPU as compare+select instead of gather).

Why a kernel at all (r4 measurements on v5e):

* dynamic gathers lower near-scalar on TPU (~8 ns/element — a
  [1956, 4096] lookup from a 66-row table costs 60-85 ms, more than the
  whole rest of the encode pass);
* the XLA compare+select chain (``device_rans._select_rows_core``)
  compiles to ONE fusion / ~4 ms standalone, but inside the big codec
  programs the fusion pass shatters it into ~1.9k materializing
  sub-fusions (141 ms — identical op counts, r4 HLO diff), and neither
  ``optimization_barrier`` nor a ``lax.map`` chunk loop restores it;
* a ``pallas_call`` is an opaque custom call: its body is compiled by
  Mosaic in isolation, immune to the surrounding program's fusion
  budget, so the chain stays a single VMEM-resident loop wherever it is
  embedded (the decode program computes row indexes mid-program per
  phase, so it CANNOT hoist the lookup into its own dispatch the way
  the encode side does).

Exactness: the kernel copies f32 scalars out of the table — no
arithmetic — so it is bit-identical to the XLA chain and to ``table[row]``
by construction (asserted in tests/test_pallas_select.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is always present in modern jax; guard for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# Lane tile: last dim 128-aligned; 8 sublanes x 128 lanes is the f32
# min tile.  Two VMEM budgets bound TILE_S (both hit at larger tiles in
# r4 bench runs on v5e):
# * window allocations: TILE_S*TILE_L*4 B per buffer, double-buffered,
#   x (1 input + k outputs) windows per call, and the encode program
#   holds two concurrently-live calls (z + y prep) — 2x32 MB at
#   TILE_S=512 blew the 128 MB program cap;
# * Mosaic's scoped kernel vmem: the unrolled 65-row select chain is
#   NOT buffer-reused by Mosaic, so the body's scratch scales with the
#   tile (21.13 M vs the 16 M scoped limit at TILE_S=128).
# 32 rows -> ~5 M scoped / ~2 M windows per call; the kernel is VPU-
# bound either way and grid-step overhead is ~us-scale.
_TILE_S = 32
_TILE_L = 1024


def _kernel(table_ref, row_ref, *out_refs):
    """One [TILE_S, TILE_L] tile: unrolled compare+select over the table
    rows, reading each table scalar once from SMEM."""
    row = row_ref[:]
    n_rows = table_ref.shape[0]
    accs = [jnp.full(row.shape, table_ref[0, j], jnp.float32)
            for j in range(len(out_refs))]
    for r in range(1, n_rows):
        eq = row == r
        accs = [jnp.where(eq, table_ref[r, j], a)
                for j, a in enumerate(accs)]
    for o, a in zip(out_refs, accs):
        o[:] = a


@functools.partial(jax.jit, static_argnums=(2, 3))
def _lookup_2d(row2d, table, n_rows: int, k: int):
    grid = (row2d.shape[0] // _TILE_S,)
    blk = pl.BlockSpec((_TILE_S, _TILE_L), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk],
        out_specs=tuple(blk for _ in range(k)),
        out_shape=tuple(
            jax.ShapeDtypeStruct(row2d.shape, jnp.float32)
            for _ in range(k)),
    )(table, row2d)


def select_rows_pallas(row: jax.Array, table: jax.Array) -> list[jax.Array]:
    """``[table[row][..., j] for j in range(k)]`` via the Pallas kernel.

    Accepts any row shape/integer dtype; pads (with row 0) to the tile
    grid and slices back.  Traceable inside jit."""
    n_rows, k = table.shape
    shape = row.shape
    n = int(np.prod(shape))
    flat = row.reshape(-1).astype(jnp.int32)
    per = _TILE_S * _TILE_L
    pad = (-n) % per
    if pad:
        flat = jnp.pad(flat, (0, pad))
    cols = _lookup_2d(flat.reshape(-1, _TILE_L),
                      table.astype(jnp.float32), n_rows, k)
    return [c.reshape(-1)[:n].reshape(shape) for c in cols]


def use_pallas_select() -> bool:
    """Kernel on real TPU unless MLIC_PALLAS_SELECT=0 (=1 forces it on,
    e.g. for interpret-mode testing on CPU via force_tpu_interpret_mode)."""
    mode = os.environ.get("MLIC_PALLAS_SELECT", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return _HAVE_PALLAS and jax.default_backend() == "tpu"
