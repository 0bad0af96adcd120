"""On-device (jittable) interleaved rANS decoding.

The TPU-native answer to the reference's per-phase device→host→device rANS
round trips (SURVEY.md §3.4: "the main latency sink"): symbols are coded
into L lockstep rans16 lanes (32-bit state, 16-bit renorm words, 16-bit
probabilities — see ``rans/rans.cpp``), so the decoder advances all L lanes
per step with pure vector arithmetic.

Two lookup strategies, selected by the structure of the ``tables`` dict:

* **Parametric (default for Gaussian tables, round 2)** — tables built by
  ``parametric_device_tables``: cdf values are EVALUATED analytically
  (``entropy.parametric.eval_cdf``, erfc on the VPU) inside a lockstep
  bisection; per decoded symbol the only dynamic gathers are one [n_rows,6]
  row-param fetch and the stream-word fetch for renormalization.  No
  multi-MB tables in HBM at all.
* **LUT fallback** — tables from ``device_tables``: O(1) cf->slot/start/
  freq lookups in precomputed [n_rows, 2^16] tables (17 MB; the random
  gathers bound the round-1 scan — kept as the fallback the codec uses
  when the parametric self-check fails, and for non-Gaussian CDFs).

Everything is uint32 math under ``jax.jit``; no host callbacks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mlic_tpu.entropy import parametric

PROB_BITS = 16
_RANS_L = np.uint32(1 << 16)
_MASK16 = np.uint32((1 << 16) - 1)
_BYPASS_BITS = 5
_BYPASS_SHIFT = PROB_BITS - _BYPASS_BITS  # 11
_MAX_BYPASS_DIGITS = 17


def device_tables(cdfs: np.ndarray, cdf_lengths: np.ndarray,
                  offsets: np.ndarray):
    """Host -> device decode tables.

    Returns a dict of jnp arrays:
      lut_sf   uint32 [n_rows, 2^16]: (freq << 16) | start per (row, cf)
      lut_slot int32  [n_rows, 2^16]: slot per (row, cf)
      max_value int32 [n_rows]: escape slot id (cdf_length - 2)
      offsets  int32  [n_rows]
    """
    cdfs = np.asarray(cdfs, np.int64)
    n = cdfs.shape[0]
    cf = np.arange(1 << PROB_BITS, dtype=np.int64)
    lut_sf = np.empty((n, 1 << PROB_BITS), np.uint32)
    lut_slot = np.empty((n, 1 << PROB_BITS), np.int32)
    for i in range(n):
        row = cdfs[i, : int(cdf_lengths[i])]
        slot = np.searchsorted(row, cf, side="right") - 1
        start = row[slot]
        freq = row[slot + 1] - start
        lut_sf[i] = ((freq.astype(np.uint32) << 16)
                     | start.astype(np.uint32))
        lut_slot[i] = slot.astype(np.int32)
    return {
        "lut_sf": jnp.asarray(lut_sf),
        "lut_slot": jnp.asarray(lut_slot),
        "max_value": jnp.asarray(np.asarray(cdf_lengths, np.int32) - 2),
        "offsets": jnp.asarray(np.asarray(offsets, np.int32)),
    }


def parametric_device_tables(params: np.ndarray, cdf_lengths: np.ndarray,
                             offsets: np.ndarray):
    """Gather-free decode tables from ``parametric.gaussian_row_params``.

    The returned dict's key structure (presence of ``row_params``) is what
    switches ``make_decoder`` into the parametric bisection path, and the
    static ``n_steps`` is carried host-side by the codec driver."""
    return {
        "row_params": jnp.asarray(params, jnp.float32),
        "max_value": jnp.asarray(np.asarray(cdf_lengths, np.int32) - 2),
        "offsets": jnp.asarray(np.asarray(offsets, np.int32)),
    }


def rans_init(words: jax.Array, lane_begin: jax.Array):
    """words: [W] int32 (16-bit values); lane_begin: [L] int32 word offsets.
    Returns carry (x uint32 [L], ptr int32 [L])."""
    w0 = words[lane_begin].astype(jnp.uint32)
    w1 = words[lane_begin + 1].astype(jnp.uint32)
    x = (w0 << 16) | w1
    return x, lane_begin + 2


def _renorm(x, ptr, words, active=None):
    need = x < _RANS_L
    if active is not None:
        need = need & active
    w = words[jnp.minimum(ptr, words.shape[0] - 1)].astype(jnp.uint32)
    x = jnp.where(need, (x << 16) | w, x)
    ptr = ptr + need.astype(jnp.int32)
    return x, ptr


def _bypass_payload(x, ptr, words, esc, max_value):
    """Masked escape decoding: lanes in ``esc`` read zigzag 4-bit digits."""
    u = jnp.zeros_like(x)
    shift = jnp.zeros(x.shape, jnp.int32)
    active = esc

    def digit_step(_, carry):
        x, ptr, u, shift, active = carry
        cf = x & _MASK16
        s5 = cf >> _BYPASS_SHIFT
        nx = jnp.uint32(1 << _BYPASS_SHIFT) * (x >> 16) + cf - (s5 << _BYPASS_SHIFT)
        x = jnp.where(active, nx, x).astype(jnp.uint32)
        x, ptr = _renorm(x, ptr, words, active)
        sh = jnp.minimum(shift, 28).astype(jnp.uint32)
        u = jnp.where(active, u | ((s5 & jnp.uint32(0xF)) << sh), u).astype(jnp.uint32)
        shift = (shift + jnp.where(active, 4, 0)).astype(jnp.int32)
        active = active & ((s5 & jnp.uint32(0x10)) != 0)
        return x, ptr, u, shift, active

    x, ptr, u, _, _ = jax.lax.fori_loop(
        0, _MAX_BYPASS_DIGITS, digit_step, (x, ptr, u, shift, active))
    neg = (u & 1) == 1
    value = jnp.where(neg, -(((u + 1) >> 1).astype(jnp.int32)),
                      ((u >> 1).astype(jnp.int32)) + max_value)
    return x, ptr, value


def make_decoder(words: jax.Array, n_steps: int = 12):
    """Bind a stream-words buffer; returns (init_fn, decode_fn).

    decode_fn(carry, indexes, tables) decodes ``indexes.size`` symbols
    (a multiple of the lane count) in position order, where ``tables`` is
    the dict from ``parametric_device_tables`` (gather-free bisection) or
    ``device_tables`` (LUT fallback).  ``n_steps`` is the static bisection
    depth for the parametric path (``parametric.bisect_steps``).
    """

    def init(lane_begin):
        return rans_init(words, lane_begin)

    def _finish_symbol(x, ptr, slot, esc, max_value, offs):
        """Shared tail: masked escape payload + offset."""

        def with_escape(args):
            x, ptr, slot = args
            x2, ptr2, esc_val = _bypass_payload(x, ptr, words, esc, max_value)
            return x2, ptr2, jnp.where(esc, esc_val, slot)

        x, ptr, value = jax.lax.cond(
            jnp.any(esc), with_escape, lambda a: a, (x, ptr, slot))
        return x, ptr, value + offs

    def _step_lut(tables):
        lut_sf = tables["lut_sf"]
        lut_slot = tables["lut_slot"]
        max_value_t = tables["max_value"]
        offsets_t = tables["offsets"]

        def step(c, row):
            x, ptr = c
            cf = (x & _MASK16).astype(jnp.int32)
            sf = lut_sf[row, cf]
            slot = lut_slot[row, cf]
            start = sf & _MASK16
            freq = sf >> 16
            x = freq * (x >> 16) + (x & _MASK16) - start
            x, ptr = _renorm(x, ptr, words)
            max_value = max_value_t[row]
            esc = slot == max_value
            x, ptr, value = _finish_symbol(x, ptr, slot, esc, max_value,
                                           offsets_t[row])
            return (x, ptr), value

        return step

    def _step_parametric(tables):
        row_params = tables["row_params"]
        max_value_t = tables["max_value"]
        offsets_t = tables["offsets"]
        total_m1 = jnp.int32((1 << PROB_BITS) - 1)

        def step(c, row):
            x, ptr = c
            cf = (x & _MASK16).astype(jnp.int32)
            p = row_params[row]                    # [L, 6] tiny gather
            max_value = max_value_t[row]           # == L_row
            # Escape is row-independent by construction: cdf(L) = 2^16 - 1.
            esc = cf == total_m1
            # Lockstep bisection on the analytically evaluated cdf.
            lo = jnp.zeros_like(cf)
            v_lo = jnp.zeros_like(cf)
            hi = max_value
            v_hi = jnp.full_like(cf, total_m1)
            for _ in range(n_steps):
                guard = (hi - lo) > 1
                mid = (lo + hi) >> 1
                v_mid = parametric.eval_cdf(mid, p)
                take = (v_mid <= cf) & guard
                keep = guard & ~take
                lo = jnp.where(take, mid, lo)
                v_lo = jnp.where(take, v_mid, v_lo)
                hi = jnp.where(keep, mid, hi)
                v_hi = jnp.where(keep, v_mid, v_hi)
            slot = jnp.where(esc, max_value, lo)
            start = jnp.where(esc, total_m1, v_lo).astype(jnp.uint32)
            freq = jnp.where(esc, 1, v_hi - v_lo).astype(jnp.uint32)
            x = freq * (x >> 16) + (x & _MASK16) - start
            x, ptr = _renorm(x, ptr, words)
            x, ptr, value = _finish_symbol(x, ptr, slot, esc, max_value,
                                           offsets_t[row])
            return (x, ptr), value

        return step

    def decode(carry, indexes, tables):
        x, ptr = carry
        L = x.shape[0]
        n = indexes.shape[0]
        steps = n // L
        idx_sl = indexes.reshape(steps, L)
        step = (_step_parametric(tables) if "row_params" in tables
                else _step_lut(tables))
        (x, ptr), sym = jax.lax.scan(step, (x, ptr), idx_sl)
        return (x, ptr), sym.reshape(n)

    return init, decode
