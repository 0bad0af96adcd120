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

Escape handling (formats v2/v3): out-of-support values travel in a plain
int32 side channel of the stream, NOT as in-lane bypass digits — the scan
body has no data-dependent control flow at all (the round-1 per-step
``lax.cond`` + masked bypass loop cost ~0.4 ms/step even with zero
escapes).  The decode scan flags escape positions and one vectorized
post-pass patches the values in.

Stream layouts: format v2 stores per-lane contiguous word blocks plus a
4 B/lane begin table; format v3 ("global emission order", the production
codec format since r3) drops the begin table entirely — see
``compact_streams_global`` and ``coder.encode_global``.

Everything is uint32 math under ``jax.jit``; no host callbacks.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from mlic_tpu.entropy import parametric

PROB_BITS = 16
_RANS_L = np.uint32(1 << 16)
_MASK16 = np.uint32((1 << 16) - 1)

# lax.scan unroll factors for the rANS scans.  Unrolling U steps per
# iteration amortizes XLA's per-iteration while-loop overhead U-fold at
# zero semantic cost (bit-identical streams; asserted by the byte-parity
# tests).  Measured r4 ([1956, 4096] encode scan): 9.4 ms at unroll=1 vs
# 3.7 ms at unroll=8.  The DECODE body is ~10x larger (12-level erfc
# bisection + renorm cumsum), so its unroll multiplies compile size/time
# substantially (single-core CPU CI compiles measured in minutes at 8) —
# keep it small by default.
_ENC_UNROLL = int(os.environ.get("MLIC_RANS_UNROLL_ENC", "8"))
_DEC_UNROLL = int(os.environ.get("MLIC_RANS_UNROLL_DEC", "2"))


def device_tables(cdfs: np.ndarray, cdf_lengths: np.ndarray,
                  offsets: np.ndarray):
    """Host -> device decode tables.

    Returns a dict of jnp arrays:
      lut_sf   uint32 [n_rows, 2^16]: (freq << 16) | start per (row, cf)
      lut_slot int32  [n_rows, 2^16]: slot per (row, cf)
      max_value int32 [n_rows]: escape slot id (cdf_length - 2)
      offsets  int32  [n_rows]
      cdf_rows int32 [n_rows, max_len]: the integer CDF rows themselves
        (slot-indexed; the on-device ENCODER's start/freq source — tiny)
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
        "cdf_rows": jnp.asarray(np.asarray(cdfs, np.int32)),
    }


def parametric_device_tables(params: np.ndarray, cdf_lengths: np.ndarray,
                             offsets: np.ndarray,
                             cdf_rows: np.ndarray | None = None):
    """Gather-free decode tables from ``parametric.gaussian_row_params``.

    The returned dict's key structure (presence of ``row_params``) is what
    switches ``make_decoder`` into the parametric bisection path, and the
    static ``n_steps`` is carried host-side by the codec driver.

    ``cdf_rows`` (the ``parametric.generate_tables`` output) feeds the
    on-device ENCODER: slot->start/freq lookups come from the integer table
    itself, never from a re-evaluation of the float formula in yet another
    XLA program (a third program's fusion could round a knife-edge entry
    differently — the exact hazard ``self_check`` pins for the decoder)."""
    out = {
        "row_params": jnp.asarray(params, jnp.float32),
        "max_value": jnp.asarray(np.asarray(cdf_lengths, np.int32) - 2),
        "offsets": jnp.asarray(np.asarray(offsets, np.int32)),
    }
    if cdf_rows is not None:
        out["cdf_rows"] = jnp.asarray(np.asarray(cdf_rows, np.int32))
    return out


def rans_init(words: jax.Array, lane_begin: jax.Array):
    """words: [W] int32 (16-bit values); lane_begin: [L] int32 word offsets.
    Returns carry (x uint32 [L], ptr int32 [L])."""
    w0 = words[lane_begin].astype(jnp.uint32)
    w1 = words[lane_begin + 1].astype(jnp.uint32)
    x = (w0 << 16) | w1
    return x, lane_begin + 2


def _renorm(x, ptr, words):
    need = x < _RANS_L
    w = words[jnp.minimum(ptr, words.shape[0] - 1)].astype(jnp.uint32)
    x = jnp.where(need, (x << 16) | w, x)
    ptr = ptr + need.astype(jnp.int32)
    return x, ptr


def rans_init_global(words: jax.Array, img_begin: jax.Array, n_lanes: int):
    """Format-v3 init: each image's block opens with its 2*n_lanes state
    words ([hi, lo] per lane, lane-ascending).  img_begin: int32 [B] word
    offsets of each image's block.  Returns (x uint32 [B*n_lanes],
    img_ptr int32 [B] first-renorm-word pointers)."""
    B = img_begin.shape[0]
    li = jnp.tile(jnp.arange(n_lanes, dtype=jnp.int32), B)
    base = jnp.repeat(img_begin, n_lanes) + 2 * li
    w0 = words[base].astype(jnp.uint32)
    w1 = words[base + 1].astype(jnp.uint32)
    x = (w0 << 16) | w1
    return x, img_begin + 2 * n_lanes


def _renorm_global(x, img_ptr, words):
    """Global-emission-order renorm: at each step the lanes that consume a
    word read them in lane-ascending order from a single per-image pointer
    (position = ptr + rank among the step's consuming lanes) — no per-lane
    begin table exists in format v3."""
    B = img_ptr.shape[0]
    lanes = x.shape[0] // B
    need = x < _RANS_L
    need_i = need.reshape(B, lanes).astype(jnp.int32)
    rank = jnp.cumsum(need_i, axis=1) - need_i          # exclusive, per image
    pos = (img_ptr[:, None] + rank).reshape(-1)
    w = words[jnp.minimum(pos, words.shape[0] - 1)].astype(jnp.uint32)
    x = jnp.where(need, (x << 16) | w, x)
    img_ptr = img_ptr + jnp.sum(need_i, axis=1)
    return x, img_ptr


def make_decoder(words: jax.Array, n_steps: int = 12,
                 esc_values: jax.Array | None = None,
                 esc_begin: jax.Array | None = None,
                 fmt: str = "lanes", n_lanes: int = 0):
    """Bind a stream buffer; returns (init_fn, decode_fn).

    decode_fn(carry, indexes, tables) decodes ``indexes.size`` symbols
    (a multiple of the lane count) in position order, where ``tables`` is
    the dict from ``parametric_device_tables`` (gather-free bisection) or
    ``device_tables`` (LUT fallback).  ``n_steps`` is the static bisection
    depth for the parametric path (``parametric.bisect_steps``).

    ``fmt`` selects the stream layout:

    * ``"lanes"`` (format v2): per-lane contiguous word blocks;
      ``init_fn(lane_begin)`` takes int32 [L] per-lane word offsets.
    * ``"global"`` (format v3): one stream per image in global emission
      order — 2*n_lanes state words then renorm words in (step, lane)
      consumption order; ``init_fn(img_begin)`` takes int32 [B] per-image
      block offsets.  No per-lane begin table exists (4 B/lane smaller
      streams; the word positions are recovered from the per-step
      consumption mask itself).  Requires ``n_lanes``.

    Escapes: the scan never branches — escape lanes advance with the
    escape slot and flag the position; the raw values come from the
    int32 side channel ``esc_values`` (``esc_begin``: per-image start
    offsets, one entry per image; images own ``lane_count/len(esc_begin)``
    consecutive lanes) in ONE vectorized patch per decode call.  Defaults:
    a single image with an empty side channel.
    """
    if esc_values is None:
        esc_values = jnp.zeros((1,), jnp.int32)
    if esc_begin is None:
        esc_begin = jnp.zeros((1,), jnp.int32)
    if fmt == "global":
        assert n_lanes > 0, "global format needs the per-image lane count"
        renorm = lambda x, p: _renorm_global(x, p, words)

        def init(img_begin):
            x, ptr = rans_init_global(words, img_begin, n_lanes)
            return x, ptr, jnp.zeros_like(esc_begin)
    else:
        renorm = lambda x, p: _renorm(x, p, words)

        def init(lane_begin):
            x, ptr = rans_init(words, lane_begin)
            return x, ptr, jnp.zeros_like(esc_begin)

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
            x, ptr = renorm(x, ptr)
            esc = slot == max_value_t[row]
            return (x, ptr), (slot + offsets_t[row], esc)

        return step

    def _step_rowtab(tables, steps):
        """Bisection over the INTEGER cdf rows themselves (format v4's z
        section): exact by construction — encoder and decoder read the same
        ``cdf_rows`` entries, so there is no cross-program float hazard at
        all (unlike the parametric path, which needs ``self_check``).  Each
        iteration costs one [L]-gather from the small [n_rows, max_len]
        table; rows here are the factorized-prior CDFs (tens of slots), so
        ``steps`` ~ 6-8."""
        rows_t = tables["cdf_rows"]
        max_value_t = tables["max_value"]
        offsets_t = tables["offsets"]

        def step(c, row):
            x, ptr = c
            cf = (x & _MASK16).astype(jnp.int32)
            max_value = max_value_t[row]
            # Invariant: cdf[lo] <= cf < cdf[hi]; cdf[0]=0, cdf[len-1]=2^16.
            lo = jnp.zeros_like(cf)
            v_lo = jnp.zeros_like(cf)
            hi = max_value + 1
            v_hi = jnp.full_like(cf, 1 << PROB_BITS)
            for _ in range(steps):
                guard = (hi - lo) > 1
                mid = (lo + hi) >> 1
                v_mid = rows_t[row, mid]
                take = (v_mid <= cf) & guard
                keep = guard & ~take
                lo = jnp.where(take, mid, lo)
                v_lo = jnp.where(take, v_mid, v_lo)
                hi = jnp.where(keep, mid, hi)
                v_hi = jnp.where(keep, v_mid, v_hi)
            start = v_lo.astype(jnp.uint32)
            freq = (v_hi - v_lo).astype(jnp.uint32)
            x = freq * (x >> 16) + (x & _MASK16) - start
            x, ptr = renorm(x, ptr)
            esc = lo == max_value
            return (x, ptr), (lo + offsets_t[row], esc)

        return step

    def _step_parametric(tables):
        total_m1 = jnp.int32((1 << PROB_BITS) - 1)

        def step(c, p):
            # p: tuple of six [L] column arrays (m, b, A, C, B, L), pre-
            # looked-up for ALL steps by the decode wrapper via
            # ``select_rows`` (flat layout — see that docstring).  Support
            # and offset derive from the L column: max_value = L,
            # offset = -(L-1)/2 (L = 2c+1; pad row L=1).
            pm, pb, pA, pC, pB, pL = p
            x, ptr = c
            max_value = pL.astype(jnp.int32)
            off = -((max_value - 1) >> 1)
            cf = (x & _MASK16).astype(jnp.int32)
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
                v_mid = parametric.eval_cdf_parts(mid, pm, pb, pA, pC, pB)
                take = (v_mid <= cf) & guard
                keep = guard & ~take
                lo = jnp.where(take, mid, lo)
                v_lo = jnp.where(take, v_mid, v_lo)
                hi = jnp.where(keep, mid, hi)
                v_hi = jnp.where(keep, v_mid, v_hi)
            start = jnp.where(esc, total_m1, v_lo).astype(jnp.uint32)
            freq = jnp.where(esc, 1, v_hi - v_lo).astype(jnp.uint32)
            x = freq * (x >> 16) + (x & _MASK16) - start
            x, ptr = renorm(x, ptr)
            return (x, ptr), (lo + off, esc)

        return step

    def decode(carry, indexes, tables, n_steps_row: int | None = None,
               pre_cols: tuple | None = None):
        x, ptr, esc_count = carry
        L = x.shape[0]
        n = indexes.shape[0]
        steps = n // L
        idx_sl = indexes.reshape(steps, L)
        if "row_params" in tables:
            step = _step_parametric(tables)
            # Rows are known before the scan: fetch the per-row params for
            # ALL steps as six flat [steps, L] column arrays (select_rows —
            # gathers are ~8 ns/elem on v5e and [steps, L, 6] pads its
            # minor dim 21x) and barrier so XLA does not re-fuse the
            # lookup into the scan body.  Callers that hold the indexes in
            # canonical (pre-transpose) layout should pass ``pre_cols``
            # (select_rows there, then reorder each column once) — running
            # the chain on a fused-transpose producer re-executes the
            # transpose per select (see ``prep_flat``).
            if pre_cols is None:
                pre_cols = select_rows(idx_sl, tables["row_params"])
            xs = jax.lax.optimization_barrier(tuple(pre_cols))
        elif "lut_sf" in tables:
            step = _step_lut(tables)
            xs = idx_sl
        else:
            step = _step_rowtab(tables, n_steps_row or n_steps)
            xs = idx_sl
        (x, ptr), (sym, esc) = jax.lax.scan(step, (x, ptr), xs,
                                            unroll=_DEC_UNROLL)
        # Side-channel patch: per-image position-order escape numbering.
        B = esc_begin.shape[0]
        lanes = L // B
        sym_i = sym.reshape(steps, B, lanes).transpose(1, 0, 2).reshape(B, -1)
        esc_i = esc.reshape(steps, B, lanes).transpose(1, 0, 2).reshape(B, -1)
        k = (jnp.cumsum(esc_i.astype(jnp.int32), axis=1) - 1
             + (esc_count + esc_begin)[:, None])
        vals = esc_values[jnp.clip(k, 0, esc_values.shape[0] - 1)]
        sym_i = jnp.where(esc_i, vals, sym_i)
        new_count = esc_count + jnp.sum(esc_i, axis=1, dtype=jnp.int32)
        out = sym_i.reshape(B, steps, lanes).transpose(1, 0, 2).reshape(n)
        return (x, ptr, new_count), out

    return init, decode


# ----------------------------------------------------------------------
# On-device interleaved rANS ENCODE (round 2).
#
# The round-1/2 encode downloaded per-symbol (sym, idx) arrays (~6 MB per
# Kodak batch at ~11 MB/s on the axon tunnel) and ran the C++ encoder on
# the host.  Encoding on device makes the download proportional to the
# COMPRESSED size instead: stream words + per-lane offsets + escape values.
#
# Structure mirrors rans.cpp's Encoder16 exactly (32-bit state, 16-bit
# renorm, emission iff x >= freq << 16 — at most ONE word per symbol since
# x < 2^32 and freq << 16 >= 2^16): a reverse-order lax.scan computes each
# lane's emissions; forward-order compaction then scatters the emitted
# words into per-lane contiguous blocks [state_hi, state_lo, words...] —
# byte-identical to ``coder.encode_interleaved`` (asserted by tests).
# ----------------------------------------------------------------------


def _select_rows_core(row: jax.Array, table: jax.Array) -> list[jax.Array]:
    n_rows, k = table.shape
    accs = [jnp.broadcast_to(table[0, j], row.shape) for j in range(k)]
    for r in range(1, n_rows):
        eq = row == r
        accs = [jnp.where(eq, table[r, j], a) for j, a in enumerate(accs)]
    return accs


def select_rows(row: jax.Array, table: jax.Array) -> list[jax.Array]:
    """Row lookup ``table[row]``, per COLUMN, as a fused compare-select
    chain — the TPU-native answer for tiny tables.

    Two measured v5e pathologies this sidesteps (r4 probes):
    * dynamic gathers lower near-scalar (~8 ns/element: a [1956, 4096]
      lookup from a 66-row table costs 60-85 ms — the whole encode budget);
    * ANY value shaped [..., n_cols] pads its minor dim to 128 lanes, so
      a [S, L, 6] params array 21x-amplifies every byte (measured ~97
      ms/batch-8 for both one-hot-matmul and stacked select variants).

    Per-column chains keep everything in the flat [S, L] layout and fuse
    into the erfc consumers: ~n_rows compare+selects per element on the
    VPU, zero extra materialization.  Exact by construction (selected
    values are the table's own f32 scalars).

    CAVEAT (r4 HLO diff): the XLA chain compiles to ONE fusion / 4.4 ms
    only when its row input is a program PARAMETER.  Inside the big codec
    program (producers fused upstream) XLA shatters the chain into ~1.9k
    materializing sub-fusions (141 ms); a ``lax.map`` chunk loop does NOT
    restore the fusion (still 142 ms in-program, and 3x slower standalone).
    Two defenses: the encode side runs its prep in its OWN dispatch
    (``Codec._build_lane_programs``), and on real TPU this routes through
    the ``ops/pallas_select`` kernel — an opaque custom call the fusion
    pass cannot shatter (required for DECODE, whose row indexes are
    computed mid-program and cannot be hoisted)."""
    from mlic_tpu.ops.pallas_select import select_rows_pallas, use_pallas_select
    if use_pallas_select():
        return select_rows_pallas(row, table)
    return list(_select_rows_core(row, table))


def analytic_start_freq(sym: jax.Array, row: jax.Array, row_params: jax.Array):
    """(start u16, freq-1 u16, esc) per symbol from the analytic quantized-
    Gaussian CDF — the encode-side twin of the decode bisection's
    ``parametric.eval_cdf`` path, with the row constants fetched by
    ``select_rows`` instead of gathers.  Valid for rows < len(row_params)
    (the Gaussian rows + pad row); offsets and support derive from the L
    column (off = -(L-1)/2, max_value = L), so no separate tables are
    touched.  Exactness vs the integer table is asserted per update by
    ``parametric.self_check_encode`` (gather fallback otherwise).

    start <= 2^16 - 1 and freq - 1 <= 2^16 - 1 both fit uint16, halving
    the materialized scan inputs.  Fusion caveat: see ``select_rows``."""
    m, b, A, C, Bc, Lf = select_rows(row.astype(jnp.int32), row_params)
    L = Lf.astype(jnp.int32)             # support size (exact in f32)
    off = -((L - 1) >> 1)
    mv = L
    v = sym - off
    esc = (v < 0) | (v >= mv)
    slot = jnp.where(esc, mv, v)
    v_lo = parametric.eval_cdf_parts(slot, m, b, A, C, Bc)
    v_hi = parametric.eval_cdf_parts(slot + 1, m, b, A, C, Bc)
    start16 = v_lo.astype(jnp.uint16)
    freqm1 = (v_hi - v_lo - 1).astype(jnp.uint16)
    return start16, freqm1, esc


def _divmod_u32(x: jax.Array, fr: jax.Array, rcp: jax.Array):
    """Exact ``divmod(x, fr)`` for uint32 ``x < fr * 2**16`` without integer
    division (XLA lowers dynamic u32 division to a long multi-op expansion
    on TPU; inside the encode scan it runs once per symbol).

    ``rcp`` is float32 ``1/fr`` (any rounding): the float estimate
    ``q0 = floor(f32(x) * rcp)`` carries relative error < 3*2^-24, and the
    true quotient is < 2^16 (the rANS emit step guarantees x < fr<<16), so
    q0 is within +-1 of the truth — one branchless correction each way
    restores exactness for ALL admissible inputs (stress-tested at the
    q-boundaries in tests/test_device_encode.py)."""
    one = jnp.uint32(1)
    q0 = (x.astype(jnp.float32) * rcp).astype(jnp.uint32)
    r0 = x - q0 * fr                        # mod 2^32; wraps iff q0 == q+1
    over = r0 >= jnp.uint32(1 << 31)
    q1 = q0 - jnp.where(over, one, 0)
    r1 = r0 + jnp.where(over, fr, 0)
    under = r1 >= fr                        # q1 == q-1 leaves r1 in [fr, 2fr)
    q = q1 + jnp.where(under, one, 0)
    r = r1 - jnp.where(under, fr, 0)
    return q, r


def _gather_start_freq(sym: jax.Array, row: jax.Array, tables: dict):
    """(start u16, freq-1 u16, esc) via integer-table gathers — the exact
    fallback (non-Gaussian rows, LUT tables, and the v4 z section)."""
    mv = tables["max_value"][row]
    off = tables["offsets"][row]
    v = sym - off
    esc = (v < 0) | (v >= mv)
    slot = jnp.where(esc, mv, v)
    start = tables["cdf_rows"][row, slot]
    nxt = tables["cdf_rows"][row, slot + 1]
    return (start.astype(jnp.uint16),
            (nxt - start - 1).astype(jnp.uint16), esc)


def encode_lanes(sym: jax.Array, row: jax.Array, tables: dict,
                 analytic_rows: int = 0, analytic_split: int = 0):
    """Lockstep rans16 encode of [S, L] position-ordered symbols.

    Args:
      sym: int32 [S, L] raw symbol values (step-major, lane-minor — the
        same position order the decode scan consumes).
      row: int32 [S, L] CDF row ids.
      tables: ``parametric_device_tables`` dict (analytic start/freq via
        ``eval_cdf``) or ``device_tables`` (gathers from the small
        slot-indexed ``cdf_rows``).
      analytic_rows: if > 0, rows at steps >= ``analytic_split`` are all
        < this count and their (start, freq) come from the ANALYTIC
        quantized-Gaussian formula with ``onehot_rows`` param lookup — no
        per-symbol gathers at all (a [1956, 4096] table gather measured
        60-85 ms on v5e, r4; the whole encode scan is ~4 ms without it).
        The codec enables this only after ``parametric.self_check_encode``
        reproduces the integer table bit-exactly.
      analytic_split: leading step count using the gather path (the v4
        stream's z section — factorized-prior rows outside row_params).
    Returns:
      x     uint32 [L] final lane states
      words uint16 [S, L] emitted renorm word per (step, lane)
      emits bool   [S, L] emission mask
      esc   bool   [S, L] escape mask (value out of the row's support)
    """
    if analytic_rows and "row_params" in tables:
        rp = tables["row_params"][:analytic_rows]
        if analytic_split:
            z = analytic_split
            st_z, fm_z, esc_z = _gather_start_freq(sym[:z], row[:z], tables)
            st_y, fm_y, esc_y = analytic_start_freq(sym[z:], row[z:], rp)
            start16 = jnp.concatenate([st_z, st_y], 0)
            freqm1 = jnp.concatenate([fm_z, fm_y], 0)
            esc = jnp.concatenate([esc_z, esc_y], 0)
        else:
            start16, freqm1, esc = analytic_start_freq(sym, row, rp)
    else:
        start16, freqm1, esc = _gather_start_freq(sym, row, tables)
    x, words, emits = encode_scan_prepped(start16, freqm1)
    return x, words, emits, esc


def encode_scan_prepped(start16: jax.Array, freqm1: jax.Array):
    """The rANS encode scan over pre-computed (start, freq-1) uint16
    arrays in [S, L] position order.  Returns (x, words, emits)."""
    # Materialize (start, freq-1) BEFORE the scan: without the barrier XLA
    # fuses the prep (gathers or erfc math) into the scan body and
    # re-issues it per step — measured 75 ms vs ~4 ms for the identical
    # scan over materialized inputs ([1956, 4096], r4 probe).  uint16
    # halves the materialized bytes (start <= 2^16-1, freq-1 <= 2^16-1).
    start16, freqm1 = jax.lax.optimization_barrier((start16, freqm1))

    def step(x, sf):
        st16, fm = sf
        st = st16.astype(jnp.uint32)
        fr = fm.astype(jnp.uint32) + 1
        # In-scan f32 reciprocal: _divmod_u32's +-1 correction tolerates
        # ~100 ulp of rcp error, far above any XLA f32 divide.
        rc = 1.0 / fr.astype(jnp.float32)
        emit = x >= (fr << 16)
        word = (x & _MASK16).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        q, r = _divmod_u32(x, fr, rc)
        x = (q << PROB_BITS) + r + st
        return x, (word, emit)

    # Initial state derives its shard_map varying-axis type from the inputs
    # (a bare constant carry is "unvarying" and scan rejects the carry-type
    # mismatch when this runs inside a sharded serving program).
    x0 = _RANS_L + start16[0].astype(jnp.uint32) * 0
    # reverse=True: last position encoded first (rANS is LIFO), but the
    # stacked outputs stay in FORWARD step order — which is exactly the
    # order the per-lane stream stores its renorm words.
    x, (words, emits) = jax.lax.scan(step, x0, (start16, freqm1),
                                     reverse=True, unroll=_ENC_UNROLL)
    return x, words, emits


def compact_streams(x, words, emits, esc, sym, n_images: int):
    """Scatter per-(step, lane) emissions into per-lane contiguous word
    blocks + per-image escape side channels (format v2 layout).

    Returns dict of device arrays:
      buf        uint16 [S*L + 2L + 1] words; lane l occupies
                 [lane_begin[l], lane_begin[l] + lane_n[l])
      lane_n     int32 [L] words per lane (incl. 2 state words)
      lane_begin int32 [L]
      ebuf       int32 [S*L + 1] escape values, per-image blocks
      ecount     int32 [n_images]
    """
    S, L = emits.shape
    emits_i = emits.astype(jnp.int32)
    prefix = jnp.cumsum(emits_i, axis=0) - emits_i       # exclusive, per lane
    lane_n = jnp.sum(emits_i, axis=0) + 2
    lane_begin = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lane_n)[:-1].astype(jnp.int32)])
    cap = S * L + 2 * L
    pos = jnp.where(emits, lane_begin[None, :] + 2 + prefix, cap)
    buf = jnp.zeros((cap + 1,), jnp.uint16)
    buf = buf.at[pos.reshape(-1)].set(words.reshape(-1), mode="drop")
    buf = buf.at[lane_begin].set((x >> 16).astype(jnp.uint16))
    buf = buf.at[lane_begin + 1].set((x & _MASK16).astype(jnp.uint16))

    lanes = L // n_images
    esc_i = esc.reshape(S, n_images, lanes).transpose(1, 0, 2).reshape(n_images, -1)
    sym_i = sym.reshape(S, n_images, lanes).transpose(1, 0, 2).reshape(n_images, -1)
    ei = esc_i.astype(jnp.int32)
    eprefix = jnp.cumsum(ei, axis=1) - ei
    ecount = jnp.sum(ei, axis=1)
    ebegin = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ecount)[:-1].astype(jnp.int32)])
    ecap = S * L
    epos = jnp.where(esc_i, ebegin[:, None] + eprefix, ecap)
    ebuf = jnp.zeros((ecap + 1,), jnp.int32)
    ebuf = ebuf.at[epos.reshape(-1)].set(sym_i.reshape(-1), mode="drop")
    return {"buf": buf, "lane_n": lane_n, "lane_begin": lane_begin,
            "ebuf": ebuf, "ecount": ecount}


def compact_streams_global(x, words, emits, esc, sym, n_images: int):
    """Format-v3 compaction: per-image word blocks in GLOBAL EMISSION ORDER
    — 2*n_lanes state words ([hi, lo] per lane, lane-ascending) followed by
    the renorm words in (step-major, lane-minor) consumption order.  The
    emission mask during encode at position (s, l) equals the renorm mask
    during decode at the same position (rANS LIFO duality — the same fact
    format v2's per-lane forward ordering relies on), so the decoder
    recovers every word position from its own per-step consumption ranks
    and NO per-lane begin table is stored: streams shrink by 4 B/lane
    (0.042 bpp at Kodak size, 512 lanes) and the host parse disappears.

    Returns dict of device arrays:
      buf    uint16 [S*L + 2L + 1] words; image b occupies
             [img_begin[b], img_begin[b] + img_n[b])
      img_n  int32 [n_images] words per image (incl. 2*n_lanes state words)
      ebuf   int32 [S*L + 1] escape values, per-image blocks
      ecount int32 [n_images]
    """
    S, L = emits.shape
    nl = L // n_images
    # (step, image, lane) -> per-image (step-major, lane-minor) emission order
    em_i = emits.reshape(S, n_images, nl).transpose(1, 0, 2).reshape(n_images, -1)
    wd_i = words.reshape(S, n_images, nl).transpose(1, 0, 2).reshape(n_images, -1)
    e = em_i.astype(jnp.int32)
    prefix = jnp.cumsum(e, axis=1) - e                   # exclusive, per image
    img_n = jnp.sum(e, axis=1) + 2 * nl
    img_begin = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(img_n)[:-1].astype(jnp.int32)])
    cap = S * L + 2 * L
    pos = jnp.where(em_i, img_begin[:, None] + 2 * nl + prefix, cap)
    buf = jnp.zeros((cap + 1,), jnp.uint16)
    buf = buf.at[pos.reshape(-1)].set(wd_i.reshape(-1), mode="drop")
    xs = x.reshape(n_images, nl)                         # lane axis is image-major
    spos = img_begin[:, None] + 2 * jnp.arange(nl, dtype=jnp.int32)[None, :]
    buf = buf.at[spos.reshape(-1)].set((xs >> 16).astype(jnp.uint16).reshape(-1))
    buf = buf.at[(spos + 1).reshape(-1)].set(
        (xs & _MASK16).astype(jnp.uint16).reshape(-1))

    esc_i = esc.reshape(S, n_images, nl).transpose(1, 0, 2).reshape(n_images, -1)
    sym_i = sym.reshape(S, n_images, nl).transpose(1, 0, 2).reshape(n_images, -1)
    ei = esc_i.astype(jnp.int32)
    eprefix = jnp.cumsum(ei, axis=1) - ei
    ecount = jnp.sum(ei, axis=1)
    ebegin = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ecount)[:-1].astype(jnp.int32)])
    ecap = S * L
    epos = jnp.where(esc_i, ebegin[:, None] + eprefix, ecap)
    ebuf = jnp.zeros((ecap + 1,), jnp.int32)
    ebuf = ebuf.at[epos.reshape(-1)].set(sym_i.reshape(-1), mode="drop")
    return {"buf": buf, "img_n": img_n, "ebuf": ebuf, "ecount": ecount}


def phase_order(flat: jax.Array, n_lanes: int, pad_row: int,
                pad_value: int = 0):
    """[B, n] per-phase values -> [steps, B*n_lanes] position order (the
    layout both scans consume): pad to a lane multiple, then step-major /
    image-major / lane-minor."""
    b, n = flat.shape
    steps = -(-n // n_lanes)
    pad = steps * n_lanes - n
    flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=pad_value)
    return (flat.reshape(b, steps, n_lanes).transpose(1, 0, 2)
            .reshape(steps, b * n_lanes))


# Pad-position (start, freq-1): the pad row's CDF is [0, 2^16-1, 2^16] in
# every table family (parametric Gaussian, LUT fallback, v4 combined), so
# pad symbols (value 0, slot 0) always see start=0, freq=2^16-1.
_PAD_START = 0
_PAD_FREQM1 = (1 << 16) - 2


def prep_flat(sym: jax.Array, row: jax.Array, tables: dict,
              analytic_rows: int = 0):
    """(start u16, freq-1 u16, esc) in the CALLER's layout.

    Run this on the canonical (pre-``phase_order``) arrays: the row-param
    select chain reads its row input ~n_rows times, and when that input is
    a fused transpose chain each read re-executes the transpose — measured
    ~97 ms/batch-8 in-program vs ~2 ms over canonical inputs (r4).  Prep
    first, then reorder the three outputs (one linear pass each)."""
    sym = sym.astype(jnp.int32)
    row = row.astype(jnp.int32)
    if analytic_rows and "row_params" in tables:
        return analytic_start_freq(sym, row,
                                   tables["row_params"][:analytic_rows])
    return _gather_start_freq(sym, row, tables)


def encode_interleaved_device(sym: jax.Array, idx: jax.Array,
                              tables: dict, n_lanes: int, n_phases: int,
                              fmt: str = "lanes", analytic_rows: int = 0):
    """Full device encode of the codec's concatenated per-phase symbols.

    Args:
      sym: int32 [B, total] per-image symbols, phases concatenated
        (``codec_encode_pass`` layout; equal phase sizes).
      idx: [B, total] CDF row ids (any int dtype).
      tables: decode-table dict (shared with the decoder).
      n_lanes: lanes per image; n_phases: static phase count.
      fmt: "lanes" (v2 per-lane blocks) or "global" (v3 emission order).
      analytic_rows: see ``prep_flat``/``analytic_start_freq``.
    Returns the ``compact_streams`` / ``compact_streams_global`` dict.
    """
    b, total = sym.shape
    n_per = total // n_phases
    pad_row = int(tables["offsets"].shape[0] - 1)
    sym = sym.astype(jnp.int32)
    st, fm, esc = prep_flat(sym, idx, tables, analytic_rows)

    def parts(a, pv):
        return jnp.concatenate(
            [phase_order(a[:, k * n_per:(k + 1) * n_per], n_lanes, pad_row,
                         pv) for k in range(n_phases)], axis=0)

    x, words, emits = encode_scan_prepped(parts(st, _PAD_START),
                                          parts(fm, _PAD_FREQM1))
    sym_steps = parts(sym, 0)
    esc_steps = parts(esc, False)
    if fmt == "global":
        return compact_streams_global(x, words, emits, esc_steps, sym_steps,
                                      b)
    return compact_streams(x, words, emits, esc_steps, sym_steps, b)


def encode_positions_device(sym_steps: jax.Array, row_steps: jax.Array,
                            tables: dict, n_images: int, fmt: str = "lanes",
                            analytic_rows: int = 0, analytic_split: int = 0):
    """Encode pre-ordered [S, L] position arrays (``phase_order`` layout).

    The format-v4 path builds these directly so the hyper-latent's phases
    (factorized-prior rows, different per-phase sizes) can be PREPENDED to
    the Gaussian y phases in one stream — callers mix row id spaces freely
    as long as ``tables['cdf_rows']/offsets/max_value`` covers them all.
    ``analytic_rows``/``analytic_split``: see ``encode_lanes`` (the v4
    caller sets the split to its z-section step count)."""
    x, words, emits, esc = encode_lanes(sym_steps, row_steps, tables,
                                        analytic_rows=analytic_rows,
                                        analytic_split=analytic_split)
    if fmt == "global":
        return compact_streams_global(x, words, emits, esc, sym_steps,
                                      n_images)
    return compact_streams(x, words, emits, esc, sym_steps, n_images)
