"""Gather-free parametric decode: analytic CDF tables + bisection decoder.

Covers the round-2 design (ROADMAP.md): generated-table validity, the
decode-shaped self-check (including that it catches corruption), and
bit-exact round trips through the parametric device decoder with escapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mlic_tpu.entropy import device_rans as dr
from mlic_tpu.entropy import parametric as pmt
from mlic_tpu.entropy.cdf import get_scale_table
from mlic_tpu.entropy.rans import coder


def _default_tables():
    params, lengths, offsets = pmt.gaussian_row_params(get_scale_table())
    table = pmt.generate_tables(params, lengths)
    return params, lengths, offsets, table


def test_generated_tables_are_rans_valid():
    params, lengths, offsets, table = _default_tables()
    assert params.shape == (65, 6)  # 64 scales + pad row
    assert pmt.validate_tables(table, lengths)
    # Pad row: slot 0 carries all mass but 1, slot 1 is the escape.
    np.testing.assert_array_equal(table[-1, :3], [0, (1 << 16) - 1, 1 << 16])
    # Uniform escape slot: cdf(L) == 2^16 - 1 on every row.
    for i in range(table.shape[0]):
        L = int(lengths[i]) - 2
        assert table[i, L] == (1 << 16) - 1


def test_self_check_passes_and_catches_corruption():
    params, lengths, offsets, table = _default_tables()
    assert pmt.self_check(params, table, lengths)
    bad = table.copy()
    bad[7, 3] += 1
    assert not pmt.self_check(params, bad, lengths)


def test_table_rate_close_to_entropy():
    """Expected code length under the table's frequencies stays within 1%
    + 0.01 bits of the exact discrete entropy of round(N(0, sigma)) —
    the +1-per-slot floor construction costs no material rate."""
    from scipy import stats

    params, lengths, offsets, table = _default_tables()
    st = get_scale_table()
    for row in (0, 10, 32, 55, 63):
        sigma = st[row]
        L = int(lengths[row]) - 2
        c = -int(offsets[row])
        k = np.arange(L)
        p = (stats.norm.cdf((k - c + 0.5) / sigma)
             - stats.norm.cdf((k - c - 0.5) / sigma))
        p = p / p.sum()
        freqs = np.diff(table[row, : L + 1]).astype(np.float64)
        mask = p > 0
        bits = -(p[mask] * np.log2(freqs[mask] / (1 << 16))).sum()
        ent = -(p[mask] * np.log2(p[mask])).sum()
        assert bits < ent * 1.01 + 0.01, (row, bits, ent)


def test_parametric_device_decode_roundtrip():
    params, lengths, offsets, table = _default_tables()
    rng = np.random.default_rng(1)
    n_lanes = 64
    n = 64 * 96
    st = get_scale_table()
    idx = rng.integers(0, 64, size=n).astype(np.int32)
    sym = np.round(rng.standard_normal(n) * st[idx]).astype(np.int32)
    sym[5] = 100000   # out-of-support escapes through the bypass path
    sym[333] = -77777
    sym[-1] = 40000
    idx[100:110] = 64  # pad-row symbols (value 0)
    sym[100:110] = 0

    stream = coder.encode_interleaved(sym, idx, n_lanes, table, lengths, offsets)
    words_np, begin_np, esc_np = coder.parse_interleaved(stream)
    assert len(esc_np) == 3  # the three out-of-support symbols
    tables = dr.parametric_device_tables(params, lengths, offsets)
    n_steps = pmt.bisect_steps(lengths)
    init, decode = dr.make_decoder(
        jnp.asarray(words_np.astype(np.int32)), n_steps,
        esc_values=jnp.asarray(np.concatenate([esc_np, [0]]).astype(np.int32)))

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        _, out = decode(carry, indexes, tables)
        return out

    out = np.asarray(run(jnp.asarray(begin_np, jnp.int32), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, sym)


def test_parametric_matches_host_oracle_decode():
    """The host C++ interleaved decoder and the parametric device decoder
    agree on the same stream (same generated tables)."""
    params, lengths, offsets, table = _default_tables()
    rng = np.random.default_rng(2)
    n_lanes = 32
    n = 32 * 40
    idx = rng.integers(0, 65, size=n).astype(np.int32)
    sym = np.where(idx == 64, 0,
                   np.round(rng.standard_normal(n) * 3).astype(np.int32))
    stream = coder.encode_interleaved(sym, idx, n_lanes, table, lengths, offsets)
    host = coder.decode_interleaved(stream, idx, table, lengths, offsets)
    np.testing.assert_array_equal(host, sym)

    words_np, begin_np, esc_np = coder.parse_interleaved(stream)
    tables = dr.parametric_device_tables(params, lengths, offsets)
    init, decode = dr.make_decoder(
        jnp.asarray(words_np.astype(np.int32)), pmt.bisect_steps(lengths),
        esc_values=jnp.asarray(np.concatenate([esc_np, [0]]).astype(np.int32)))

    @jax.jit
    def run(begin, indexes):
        carry = init(begin)
        _, out = decode(carry, indexes, tables)
        return out

    out = np.asarray(run(jnp.asarray(begin_np, jnp.int32), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, sym)


def test_codec_update_enables_parametric():
    from mlic_tpu.codec import Codec
    from mlic_tpu.models.registry import get_model

    model = get_model("MLICPP_TINY")
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    codec = Codec(model, params, backend="device", n_lanes=16)
    codec.update()
    assert codec.parametric, "parametric path should self-check green on CPU"
    out = codec.compress(x)
    dec = codec.decompress(out["strings"], out["shape"])
    np.testing.assert_array_equal(np.asarray(out["y_hat"]),
                                  np.asarray(dec["y_hat"]))
    np.testing.assert_array_equal(np.asarray(out["x_hat"]),
                                  np.asarray(dec["x_hat"]))
