"""Interleaved rans16: host encoder vs host oracle vs on-device jnp decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.entropy import device_rans as dr
from mlic_tpu.entropy.cdf import build_cdf_tables
from mlic_tpu.entropy.rans import coder


def _tables(rng, n_ctx=8, max_len=24):
    pmf_lengths = rng.integers(2, max_len + 1, size=n_ctx)
    pmfs = np.zeros((n_ctx, max_len))
    tails = np.zeros(n_ctx)
    for i, L in enumerate(pmf_lengths):
        p = rng.random(L) + 1e-4
        p /= p.sum() * 1.02
        pmfs[i, :L] = p
        tails[i] = 1.0 - p.sum()
    cdfs, cdf_lengths = build_cdf_tables(pmfs, pmf_lengths, tails, max_len)
    offsets = rng.integers(-10, 10, size=n_ctx).astype(np.int32)
    return cdfs, cdf_lengths, offsets


@pytest.mark.parametrize("n_lanes", [4, 32])
def test_interleaved_host_roundtrip(n_lanes):
    rng = np.random.default_rng(0)
    cdfs, lens, offs = _tables(rng)
    n = 4096
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    max_vals = (lens[idx] - 2).astype(np.int64)
    sym = ((rng.random(n) * max_vals).astype(np.int64) + offs[idx]).astype(np.int32)
    sym[5] = 100000  # escape
    sym[77] = -100000
    stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
    out = coder.decode_interleaved(stream, idx, cdfs, lens, offs)
    np.testing.assert_array_equal(out, sym)


def test_device_decode_matches_host():
    rng = np.random.default_rng(1)
    cdfs, lens, offs = _tables(rng)
    n_lanes = 8
    n = 2048  # multiple of lanes
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    sym = rng.integers(-12, 12, size=n).astype(np.int32)
    sym[3] = 5000  # force escapes through the masked bypass path
    sym[1000] = -77777
    stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
    words_np, begin_np = coder.parse_interleaved(stream)

    words = jnp.asarray(words_np.astype(np.int32))
    tables = dr.device_tables(cdfs, lens, offs)
    init, decode = dr.make_decoder(words)

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        _, out = decode(carry, indexes, tables)
        return out

    out = np.asarray(run(jnp.asarray(begin_np, jnp.int32), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, sym)


def test_device_decode_streaming_blocks():
    """Sequential decode of ranges (like the per-phase structure) with the
    carry threaded between calls inside one jit."""
    rng = np.random.default_rng(2)
    cdfs, lens, offs = _tables(rng)
    n_lanes = 16
    block = 512
    n = block * 4
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    sym = rng.integers(-12, 12, size=n).astype(np.int32)
    stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
    words_np, begin_np = coder.parse_interleaved(stream)
    words = jnp.asarray(words_np.astype(np.int32))
    tables = dr.device_tables(cdfs, lens, offs)
    init, decode = dr.make_decoder(words)

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        outs = []
        for k in range(4):
            carry, o = decode(carry, indexes[k * block:(k + 1) * block],
                              tables)
            outs.append(o)
        return jnp.concatenate(outs)

    out = np.asarray(run(jnp.asarray(begin_np, jnp.int32), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, sym)


def test_gaussian_scale_tables_device_decode():
    """Full-size Gaussian tables (the real codec tables) through the device
    decoder."""
    from mlic_tpu.entropy.models import GaussianConditionalTables
    tables = GaussianConditionalTables.create()
    rng = np.random.default_rng(3)
    n_lanes = 128
    n = 128 * 64
    idx = rng.integers(0, 64, size=n).astype(np.int32)
    sym = np.round(rng.standard_normal(n) * tables.scale_table[idx]).astype(np.int32)
    stream = coder.encode_interleaved(sym, idx, n_lanes, tables.quantized_cdf,
                                      tables.cdf_length, tables.offset)
    words_np, begin_np = coder.parse_interleaved(stream)
    words = jnp.asarray(words_np.astype(np.int32))
    dev_tables = dr.device_tables(
        tables.quantized_cdf, tables.cdf_length, tables.offset)
    init, decode = dr.make_decoder(words)

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        _, out = decode(carry, indexes, dev_tables)
        return out

    out = np.asarray(run(jnp.asarray(begin_np, jnp.int32), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, sym)
