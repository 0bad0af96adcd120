"""On-device (jittable) interleaved rANS decoding.

The TPU-native answer to the reference's per-phase device→host→device rANS
round trips (SURVEY.md §3.4: "the main latency sink"): symbols are coded
into L lockstep rans16 lanes (32-bit state, 16-bit renorm words, 16-bit
probabilities — see ``rans/rans.cpp``), so the decoder advances all L lanes
per step with pure vector arithmetic + two gathers (CDF binary search rounds
and one stream-word fetch).  The whole decompress becomes ONE compiled
program; the bitstream is uploaded once.

Everything here is uint32 math under ``jax.jit``; no host callbacks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PROB_BITS = 16
_RANS_L = np.uint32(1 << 16)
_MASK16 = np.uint32((1 << 16) - 1)
_BYPASS_BITS = 5
_BYPASS_SHIFT = PROB_BITS - _BYPASS_BITS  # 11
_MAX_BYPASS_DIGITS = 17


def device_tables(cdfs: np.ndarray, cdf_lengths: np.ndarray,
                  offsets: np.ndarray):
    """Host -> device CDF tables: pad rows beyond their length with 2^16 so a
    fixed-iteration binary search never selects a dead slot."""
    dev = np.array(cdfs, dtype=np.int32, copy=True)
    n, t = dev.shape
    col = np.arange(t)[None, :]
    dev[col >= np.asarray(cdf_lengths).reshape(-1, 1)] = 1 << 16
    return (jnp.asarray(dev, jnp.int32),
            jnp.asarray(np.asarray(cdf_lengths), jnp.int32),
            jnp.asarray(np.asarray(offsets), jnp.int32))


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
    shift = jnp.zeros_like(x, jnp.int32)
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


def make_decoder(words: jax.Array):
    """Bind a stream-words buffer; returns (init_fn, decode_fn)."""

    def init(lane_begin):
        return rans_init(words, lane_begin)

    def decode(carry, indexes, cdf_dev, cdf_lengths, offsets):
        x, ptr = carry
        L = x.shape[0]
        n = indexes.shape[0]
        steps = n // L
        idx_sl = indexes.reshape(steps, L)
        t = cdf_dev.shape[1]
        n_search = int(np.ceil(np.log2(t)))

        def step(c, row):
            x, ptr = c
            cf = (x & _MASK16).astype(jnp.int32)
            lo = jnp.zeros((L,), jnp.int32)
            hi = jnp.full((L,), t - 2, jnp.int32)
            for _ in range(n_search):
                mid = (lo + hi + 1) >> 1
                v = cdf_dev[row, mid]
                take = v <= cf
                lo = jnp.where(take, mid, lo)
                hi = jnp.where(take, hi, mid - 1)
            slot = lo
            start = cdf_dev[row, slot].astype(jnp.uint32)
            freq = (cdf_dev[row, slot + 1] - cdf_dev[row, slot]).astype(jnp.uint32)
            x = freq * (x >> 16) + (x & _MASK16) - start
            x, ptr = _renorm(x, ptr, words)

            max_value = cdf_lengths[row] - 2
            esc = slot == max_value

            def with_escape(args):
                x, ptr, slot = args
                x2, ptr2, esc_val = _bypass_payload(x, ptr, words, esc, max_value)
                return x2, ptr2, jnp.where(esc, esc_val, slot)

            x, ptr, value = jax.lax.cond(
                jnp.any(esc), with_escape, lambda a: a, (x, ptr, slot))
            return (x, ptr), value + offsets[row]

        (x, ptr), sym = jax.lax.scan(step, (x, ptr), idx_sl)
        return (x, ptr), sym.reshape(n)

    return init, decode
