"""Pallas TPU kernel: fused residual-block tail for the g_a/g_s stacks.

Computes ``act2(pointwise(depthwise3x3(gelu(mid)))) + skip`` in ONE pass
over HBM, where ``mid`` is the pre-activation output of a block's first
conv and ``act2`` is GDN, IGDN, or GELU.  This is the tail of every
residual block in the analysis/synthesis transforms (reference
``MLIC++/modules/layers/res_blk.py:62-154`` — re-designed for TPU: the
reference runs each op as a separate CUDA kernel; XLA fuses the
elementwise pieces but still materializes the depthwise taps, the
pointwise matmul operand, and the GDN normalizer to HBM between ops.
PARITY.md's in-program profile puts g_a at 36 ms and g_s at 30 ms per
batch-8 768x512 — HBM-bound at <1% MXU utilization, so every removed
materialization is wall-clock).

Design:

* grid = (batch, H/T row tiles); each step DMAs a (T+2)-row halo slice
  of the zero-padded ``mid`` from HBM into VMEM (the halo is the 3x3
  depthwise reach; padding rows/cols are zero BEFORE gelu, and
  gelu(0) == 0, so in-kernel gelu reproduces the flax op order exactly);
* the depthwise 3x3 is 9 shifted VMEM multiply-adds in the same
  accumulation order as ``layers.DepthwiseConv2D`` (XLA lowers grouped
  convs pathologically on this TPU — ROADMAP);
* the pointwise 1x1 and the GDN ``x^2 @ gamma`` contraction run on the
  MXU with float32 accumulation (the bf16-mixed GDN policy of
  ``layers.GDN``);
* GDN's nonnegativity reparam (lower_bound -> square - ped) is applied
  OUTSIDE the kernel; the kernel receives effective gamma/beta.

Forward-only: the training path keeps the flax composition (a
``pallas_call`` has no VJP here); the kernel is enabled explicitly via
``MLIC_FUSED_BLOCKS=1`` for the codec/bench path and A/B'd against the
flax lowering before being trusted (tests assert interpret-mode
equality; tools/microbench.py MB_SET=fusedblk measures on chip).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is always present in modern jax; guard for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# VMEM budget for one grid step's live buffers (halo tile + skip/out
# blocks + matmul operands; Mosaic double-buffers the pipelined blocks).
_VMEM_BUDGET = 8 * 1024 * 1024


def use_fused_blocks() -> bool:
    """Opt-in only: MLIC_FUSED_BLOCKS=1 (codec/bench set it after the A/B;
    training never does — the kernel has no VJP)."""
    return _HAVE_PALLAS and os.environ.get("MLIC_FUSED_BLOCKS", "0") == "1"


def _pick_tiles(h: int, w: int, c: int, itemsize: int):
    """Largest (row, col) tile dividing (h, w) whose working set fits."""
    cp = -(-c // 128) * 128  # lane padding
    for t in (64, 32, 16, 8):
        if h % t:
            continue
        for wt in (512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8):
            if w % wt:
                continue
            # halo tile + gelu copy + matmul temps + 2x2 pipelined blocks
            words = (t + 2) * (wt + 8) * cp * 2 + 9 * t * wt * cp
            if words * itemsize <= _VMEM_BUDGET:
                return t, wt
    return None


def _kernel(midp_ref, skip_ref, dw_ref, bdw_ref, pw_ref, bpw_ref,
            gamma_ref, beta_ref, out_ref, *, act: str, t: int, wt: int):
    """One (batch, row-tile, col-tile) step.  midp_ref is the full
    zero-padded [B, H+2, W+2, C] array left in HBM; the rest is VMEM."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def body(mtile, sem):
        # Column halo is DMA'd as an ALIGNED superset (wt+8 wide at an
        # 8-aligned offset — Mosaic requires 8-sublane / 128-lane aligned
        # slices); the 6 spare columns are simply never read below.
        dma = pltpu.make_async_copy(
            midp_ref.at[b, pl.ds(i * t, t + 2), pl.ds(j * wt, wt + 8)],
            mtile, sem)
        dma.start()
        dma.wait()
        g = jax.nn.gelu(mtile[:])  # [T+2, WT+8, C]; gelu(pad 0) == 0
        acc = None
        for di in range(3):
            for dj in range(3):
                term = g[di:di + t, dj:dj + wt, :] * dw_ref[di * 3 + dj, :]
                acc = term if acc is None else acc + term
        acc = acc + bdw_ref[:]
        c_in = acc.shape[-1]
        n_out = pw_ref.shape[-1]
        h = jnp.dot(acc.reshape(t * wt, c_in), pw_ref[:],
                    preferred_element_type=jnp.float32)
        h = h + bpw_ref[:].astype(jnp.float32)
        dt = mtile.dtype
        if act == "gelu":
            y = jax.nn.gelu(h).astype(dt).reshape(t, wt, n_out)
        else:
            y = h.astype(dt)
            norm = jnp.dot(y * y, gamma_ref[:].astype(dt),
                           preferred_element_type=jnp.float32)
            norm = norm + beta_ref[:].astype(jnp.float32)
            fac = jnp.sqrt(norm) if act == "igdn" else jax.lax.rsqrt(norm)
            y = (y * fac.astype(dt)).reshape(t, wt, n_out)
        out_ref[0] = y + skip_ref[0]

    pl.run_scoped(
        body,
        mtile=pltpu.VMEM((t + 2, wt + 8, midp_ref.shape[-1]),
                         midp_ref.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("act", "t", "wt"))
def _call(midp, skip, dw, bdw, pw, bpw, gamma, beta, act: str, t: int,
          wt: int):
    b, hp, wp, c = midp.shape
    h, w = hp - 2, wp - 8  # rows halo-padded +2, cols aligned-padded +8
    n_out = pw.shape[-1]
    blk = pl.BlockSpec((1, t, wt, n_out),
                       lambda bi, ti, wi: (bi, ti, wi, 0),
                       memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, act=act, t=t, wt=wt),
        grid=(b, h // t, w // wt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  blk, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, h, w, n_out), skip.dtype),
    )(midp, skip, dw, bdw, pw, bpw, gamma, beta)


def fused_block_tail(mid, skip, dw_kernel, dw_bias, pw_kernel, pw_bias,
                     gamma=None, beta=None, act: str = "gdn"):
    """``act2(pw(dw3x3(gelu(mid)))) + skip`` fused, or None if the shapes
    don't tile (caller falls back to the flax composition).

    mid:  [B, H, W, C]   pre-gelu first-conv output
    skip: [B, H, W, N]   residual branch (same spatial grid)
    dw_kernel [3,3,1,C] / dw_bias [C]; pw_kernel [1,1,C,N] / pw_bias [N]
    gamma [N, N], beta [N]: EFFECTIVE GDN params (post-reparam), for
    act in ("gdn", "igdn"); act == "gelu" ignores them.
    """
    if not _HAVE_PALLAS:
        return None
    b, h, w, c = mid.shape
    n_out = pw_kernel.shape[-1]
    if skip.shape != (b, h, w, n_out):
        return None
    tiles = _pick_tiles(h, w, max(c, n_out), mid.dtype.itemsize)
    if tiles is None:
        return None
    t, wt = tiles
    dt = mid.dtype
    if act == "gelu":
        gamma = jnp.zeros((n_out, n_out), jnp.float32)
        beta = jnp.zeros((n_out,), jnp.float32)
    # Mosaic requires HBM slices (and healthy MXU operands) to be
    # 128-lane-aligned in the minor dim; production channel counts
    # (96/192/320) are not.  Zero-pad channels to the lane tile: gelu(0)=0
    # and zero-padded dw/pw weights keep padded input lanes inert; padded
    # OUTPUT lanes get beta=1 (norm=1 -> fac=1 -> y stays 0, avoiding
    # rsqrt(0)=inf NaNs in discarded lanes) and are sliced away below.
    cp = -(-c // 128) * 128
    npad = -(-n_out // 128) * 128
    dw9 = jnp.pad(dw_kernel.reshape(9, c), ((0, 0), (0, cp - c)))
    bdw = jnp.pad(dw_bias, (0, cp - c))
    pwm = jnp.pad(pw_kernel.reshape(c, n_out),
                  ((0, cp - c), (0, npad - n_out)))
    bpw = jnp.pad(pw_bias, (0, npad - n_out))
    gam = jnp.pad(gamma, ((0, npad - n_out), (0, npad - n_out)))
    bet = jnp.pad(beta, (0, npad - n_out), constant_values=1.0)
    # Rows get the plain 3x3 halo pad; columns pad to (1, 7) so every
    # tile's aligned wt+8 DMA window stays in bounds (last tile reads
    # [w - wt, w + 8)).
    midp = jnp.pad(mid, ((0, 0), (1, 1), (1, 7), (0, cp - c)))
    skipp = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, npad - n_out)))
    out = _call(
        midp, skipp.astype(dt),
        dw9.astype(dt), bdw.astype(dt),
        pwm.astype(dt), bpw.astype(jnp.float32),
        gam.astype(jnp.float32), bet.astype(jnp.float32),
        act, t, wt)
    return out[..., :n_out] if npad != n_out else out
