"""rANS coder round-trip and cross-implementation tests."""

import numpy as np
import pytest

from mlic_tpu.entropy.cdf import pmf_to_quantized_cdf, build_cdf_tables
from mlic_tpu.entropy.rans import coder


def _random_tables(rng, n_ctx=8, max_pmf_len=24):
    pmf_lengths = rng.integers(2, max_pmf_len + 1, size=n_ctx)
    pmfs = np.zeros((n_ctx, max_pmf_len))
    tails = np.zeros(n_ctx)
    for i, L in enumerate(pmf_lengths):
        p = rng.random(L) + 1e-4
        p /= p.sum() * 1.02
        pmfs[i, :L] = p
        tails[i] = 1.0 - p.sum()
    cdfs, cdf_lengths = build_cdf_tables(pmfs, pmf_lengths, tails, max_pmf_len)
    offsets = rng.integers(-10, 10, size=n_ctx).astype(np.int32)
    return cdfs, cdf_lengths, offsets, pmf_lengths


def test_pmf_to_quantized_cdf_properties():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = rng.integers(2, 300)
        pmf = rng.random(n)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1), "every symbol must keep mass"


def test_pmf_to_quantized_cdf_tiny_mass():
    pmf = np.array([1e-12, 0.5, 1e-12, 0.5, 0.0])
    cdf = pmf_to_quantized_cdf(pmf)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == 1 << 16


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_in_range(seed):
    rng = np.random.default_rng(seed)
    cdfs, cdf_lengths, offsets, pmf_lengths = _random_tables(rng)
    n = 5000
    indexes = rng.integers(0, len(cdf_lengths), size=n).astype(np.int32)
    max_vals = (cdf_lengths[indexes] - 2).astype(np.int64)
    values = (rng.random(n) * max_vals).astype(np.int64)
    symbols = (values + offsets[indexes]).astype(np.int32)

    stream = coder.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    decoded = coder.decode_with_indexes(stream, indexes, cdfs, cdf_lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_roundtrip_with_escapes():
    rng = np.random.default_rng(3)
    cdfs, cdf_lengths, offsets, _ = _random_tables(rng)
    n = 2000
    indexes = rng.integers(0, len(cdf_lengths), size=n).astype(np.int32)
    # Mix of huge positive, huge negative, and in-range symbols.
    symbols = rng.integers(-5000, 5000, size=n).astype(np.int32)
    symbols[0] = 2**30
    symbols[1] = -(2**30)
    stream = coder.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    decoded = coder.decode_with_indexes(stream, indexes, cdfs, cdf_lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_streaming_decode_matches_oneshot():
    rng = np.random.default_rng(4)
    cdfs, cdf_lengths, offsets, _ = _random_tables(rng)
    n = 1000
    indexes = rng.integers(0, len(cdf_lengths), size=n).astype(np.int32)
    symbols = rng.integers(-30, 30, size=n).astype(np.int32)
    stream = coder.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    dec = coder.RansDecoder()
    dec.set_stream(stream)
    parts = []
    for lo in range(0, n, 137):
        parts.append(dec.decode_stream(indexes[lo:lo + 137], cdfs, cdf_lengths, offsets))
    np.testing.assert_array_equal(np.concatenate(parts), symbols)


def test_native_matches_numpy_format():
    if coder.rans_backend() != "native":
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    cdfs, cdf_lengths, offsets, _ = _random_tables(rng)
    n = 500
    indexes = rng.integers(0, len(cdf_lengths), size=n).astype(np.int32)
    symbols = rng.integers(-100, 100, size=n).astype(np.int32)
    native_stream = coder.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    numpy_stream = coder._numpy_encode(symbols, indexes, cdfs, cdf_lengths, offsets)
    assert native_stream == numpy_stream
    # numpy decoder reads the native stream
    np_dec = coder._NumpyDecoder(native_stream)
    decoded = np_dec.decode(indexes, cdfs, cdf_lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)


def test_empty_stream():
    cdfs = np.array([[0, 30000, 65536]], dtype=np.int32)
    stream = coder.encode_with_indexes([], [], cdfs, [3], [0])
    decoded = coder.decode_with_indexes(stream, [], cdfs, [3], [0])
    assert len(decoded) == 0


def test_compression_efficiency():
    """A peaked distribution should compress close to its entropy."""
    rng = np.random.default_rng(6)
    probs = np.array([0.01, 0.09, 0.4, 0.4, 0.09, 0.01])
    pmf = probs * 0.999
    cdfs, cdf_lengths = build_cdf_tables(pmf[None, :], np.array([6]), np.array([0.001]), 6)
    offsets = np.array([-3], dtype=np.int32)
    n = 50000
    values = rng.choice(6, size=n, p=probs)
    symbols = (values - 3).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    stream = coder.encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)
    entropy_bits = -np.sum(probs * np.log2(probs)) * n
    actual_bits = len(stream) * 8
    assert actual_bits < entropy_bits * 1.02 + 128
    decoded = coder.decode_with_indexes(stream, indexes, cdfs, cdf_lengths, offsets)
    np.testing.assert_array_equal(decoded, symbols)
