"""Interleaved rans16 (format v2): host encoder vs host oracle vs on-device
jnp decoder, incl. the escape side channel."""

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


def _device_decode(stream, idx, cdfs, lens, offs):
    words_np, begin_np, esc_np = coder.parse_interleaved(stream)
    words = jnp.asarray(words_np.astype(np.int32))
    esc_vals = jnp.asarray(np.concatenate([esc_np, [0]]).astype(np.int32))
    tables = dr.device_tables(cdfs, lens, offs)
    init, decode = dr.make_decoder(words, esc_values=esc_vals)

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        _, out = decode(carry, indexes, tables)
        return out

    return np.asarray(run(jnp.asarray(begin_np, jnp.int32), jnp.asarray(idx)))


@pytest.mark.parametrize("n_lanes", [4, 32])
def test_interleaved_host_roundtrip(n_lanes):
    rng = np.random.default_rng(0)
    cdfs, lens, offs = _tables(rng)
    n = 4096
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    max_vals = (lens[idx] - 2).astype(np.int64)
    sym = ((rng.random(n) * max_vals).astype(np.int64) + offs[idx]).astype(np.int32)
    sym[5] = 100000  # escape -> side channel
    sym[77] = -100000
    stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
    out = coder.decode_interleaved(stream, idx, cdfs, lens, offs)
    np.testing.assert_array_equal(out, sym)


def test_escape_side_channel_layout():
    """Escapes are raw int32 values in position order after the words."""
    rng = np.random.default_rng(5)
    cdfs, lens, offs = _tables(rng)
    n = 256
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    sym = np.zeros(n, np.int32) + offs[idx]
    sym[10] = 70000
    sym[200] = -70000
    stream = coder.encode_interleaved(sym, idx, 8, cdfs, lens, offs)
    _, _, esc = coder.parse_interleaved(stream)
    np.testing.assert_array_equal(esc, [70000, -70000])


def test_device_decode_matches_host():
    rng = np.random.default_rng(1)
    cdfs, lens, offs = _tables(rng)
    n_lanes = 8
    n = 2048  # multiple of lanes
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    sym = rng.integers(-12, 12, size=n).astype(np.int32)
    sym[3] = 5000  # escapes through the side channel
    sym[1000] = -77777
    stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
    out = _device_decode(stream, idx, cdfs, lens, offs)
    np.testing.assert_array_equal(out, sym)


def test_device_decode_streaming_blocks():
    """Sequential decode of ranges (like the per-phase structure) with the
    carry threaded between calls inside one jit — escape numbering must
    carry across blocks."""
    rng = np.random.default_rng(2)
    cdfs, lens, offs = _tables(rng)
    n_lanes = 16
    block = 512
    n = block * 4
    idx = rng.integers(0, len(lens), size=n).astype(np.int32)
    sym = rng.integers(-12, 12, size=n).astype(np.int32)
    sym[100] = 90001   # escapes spread across blocks
    sym[600] = -90002
    sym[1500] = 90003
    stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
    words_np, begin_np, esc_np = coder.parse_interleaved(stream)
    words = jnp.asarray(words_np.astype(np.int32))
    esc_vals = jnp.asarray(np.concatenate([esc_np, [0]]).astype(np.int32))
    tables = dr.device_tables(cdfs, lens, offs)
    init, decode = dr.make_decoder(words, esc_values=esc_vals)

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


def test_multi_image_escape_channels():
    """Batched decode: each image owns its own side channel; per-image
    escape numbering must not leak across images."""
    rng = np.random.default_rng(7)
    cdfs, lens, offs = _tables(rng)
    n_lanes, B, n_img = 8, 3, 512
    idx = rng.integers(0, len(lens), size=(B, n_img)).astype(np.int32)
    sym = rng.integers(-8, 8, size=(B, n_img)).astype(np.int32)
    sym[0, 5] = 50001
    sym[2, 7] = -50002
    sym[2, 400] = 50003
    words_list, begins, escs, esc_begins = [], [], [], []
    off = esc_off = 0
    for b in range(B):
        s = coder.encode_interleaved(sym[b], idx[b], n_lanes, cdfs, lens, offs)
        wds, beg, esc = coder.parse_interleaved(s)
        words_list.append(wds.astype(np.int32))
        begins.append(beg.astype(np.int64) + off)
        off += len(wds)
        escs.append(esc)
        esc_begins.append(esc_off)
        esc_off += len(esc)
    words = jnp.asarray(np.concatenate(words_list))
    esc_vals = jnp.asarray(np.concatenate(escs + [np.zeros(1, np.int32)]))
    esc_begin = jnp.asarray(np.asarray(esc_begins, np.int32))
    lane_begin = jnp.asarray(np.concatenate(begins).astype(np.int32))
    tables = dr.device_tables(cdfs, lens, offs)
    init, decode = dr.make_decoder(words, esc_values=esc_vals,
                                   esc_begin=esc_begin)
    # scan order: step-major, image-major, lane-minor
    ordered = idx.reshape(B, -1, n_lanes).transpose(1, 0, 2).reshape(-1)

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        _, out = decode(carry, indexes, tables)
        return out

    out = np.asarray(run(lane_begin, jnp.asarray(ordered)))
    out = out.reshape(-1, B, n_lanes).transpose(1, 0, 2).reshape(B, n_img)
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
    out = _device_decode(stream, idx, tables.quantized_cdf,
                         tables.cdf_length, tables.offset)
    np.testing.assert_array_equal(out, sym)
