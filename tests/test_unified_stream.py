"""Stream format v4: unified y+z coding fully on device.

The hyper-latent's symbols are coded INLINE as the leading phases of the
interleaved stream (factorized-prior CDF rows appended to the combined
device table; decode by integer-row bisection — exact by construction).
No host entropy coding remains in either direction of the device backend.

Covers: the row-bisection decode step against the host oracle, byte parity
of the v4 device stream with ``coder.encode_global`` over combined tables,
bit-exact round trips (fixed-rate and VBR with a variable-rate bottleneck),
and v3 interop (a v3 stream still decodes through a unified codec).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.codec import Codec
from mlic_tpu.entropy.device_rans import make_decoder, phase_order
from mlic_tpu.entropy.rans.coder import (
    encode_global,
    parse_global,
    stream_is_unified,
)
from mlic_tpu.models.registry import get_model


def _random_cdf_rows(rng, n_rows, max_len):
    """Valid integer CDF rows of random lengths: cdf[0]=0, cdf[-1]=2^16,
    strictly increasing (the rANS contract from CLAUDE.md)."""
    lengths = rng.integers(4, max_len + 1, n_rows).astype(np.int32)
    rows = np.zeros((n_rows, max_len), np.int32)
    offsets = rng.integers(-12, 1, n_rows).astype(np.int32)
    for i in range(n_rows):
        li = int(lengths[i])
        cuts = np.sort(rng.choice(np.arange(1, 1 << 16), li - 2,
                                  replace=False))
        rows[i, :li] = np.concatenate([[0], cuts, [1 << 16]])
    return rows, lengths, offsets


def test_rowtab_bisection_matches_host_oracle():
    rng = np.random.default_rng(11)
    rows, lengths, offsets = _random_cdf_rows(rng, 7, 40)
    n_lanes, steps = 8, 30
    n = n_lanes * steps
    idx = rng.integers(0, 7, n).astype(np.int32)
    span = lengths[idx] - 2
    sym = (offsets[idx] + rng.integers(0, span)).astype(np.int32)
    esc_mask = rng.random(n) < 0.05
    sym[esc_mask] = rng.integers(-500, 500, esc_mask.sum())

    stream = encode_global(sym, idx, n_lanes, rows, lengths, offsets)
    _nl, words, esc = parse_global(stream)
    wbuf = jnp.asarray(np.concatenate([words, np.zeros(16, np.uint16)])
                       .astype(np.int32))
    tables = {"cdf_rows": jnp.asarray(rows),
              "max_value": jnp.asarray(lengths - 2),
              "offsets": jnp.asarray(offsets)}
    n_steps = int(np.ceil(np.log2(rows.shape[1])))
    init, decode = make_decoder(
        wbuf, n_steps, jnp.asarray(np.concatenate([esc, [0]])),
        jnp.zeros(1, jnp.int32), fmt="global", n_lanes=n_lanes)
    carry = init(jnp.zeros(1, jnp.int32))
    _, got = jax.jit(lambda c, i: decode(c, i, tables))(
        carry, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(got), sym)


@pytest.fixture(scope="module")
def tiny_codec():
    model = get_model("MLICPP_TINY")
    x = jax.random.uniform(jax.random.key(0), (2, 64, 128, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    codec = Codec(model, params, backend="device", n_lanes=32)
    codec.update()
    return model, params, x, codec


def test_unified_roundtrip_bit_exact(tiny_codec):
    model, params, x, codec = tiny_codec
    assert codec.unified_z
    enc = codec.compress(x)
    # v4: one self-contained stream per image, empty z slot for containers
    assert all(stream_is_unified(s) for s in enc["strings"][0])
    assert all(s == b"" for s in enc["strings"][1])
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                  np.asarray(dec["y_hat"]))
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_unified_byte_parity_with_host_oracle(tiny_codec):
    """The v4 device stream must equal ``encode_global`` over the combined
    tables with the z phases prepended in position order."""
    model, params, x, codec = tiny_codec
    h = codec.compress_begin(x)
    enc = codec.compress_end(dict(h))
    comb = codec._comb_cache[1.0]
    rows = np.asarray(comb["cdf_rows"])
    lengths = np.asarray(comb["max_value"]) + 2
    offsets = np.asarray(comb["offsets"])
    base = codec._z_rows_base
    pad_row = base - 1
    nl = codec.n_lanes
    n_ph = 2 * model.cfg.slice_num
    z = np.asarray(h["z_symbols"])
    sym32 = np.asarray(
        codec._encode_full_v4(params, jnp.asarray(x), 1.0, 1.0, comb)["sym16"]
    ).astype(np.int32)
    idx = np.asarray(h["idx"]).astype(np.int32)
    b = x.shape[0]
    z_flat = z.reshape(b, -1)
    z_rows = base + (np.arange(z_flat.shape[1], dtype=np.int32) % model.cfg.N)
    n_per = sym32.shape[1] // n_ph
    for img in range(b):
        parts_s = [np.asarray(phase_order(
            jnp.asarray(z_flat[img:img + 1]), nl, pad_row, 0)).ravel()]
        parts_r = [np.asarray(phase_order(
            jnp.asarray(np.broadcast_to(z_rows[None], (1, len(z_rows)))),
            nl, pad_row, pad_row)).ravel()]
        for k in range(n_ph):
            sl = slice(k * n_per, (k + 1) * n_per)
            parts_s.append(np.asarray(phase_order(
                jnp.asarray(sym32[img:img + 1, sl]), nl, pad_row, 0)).ravel())
            parts_r.append(np.asarray(phase_order(
                jnp.asarray(idx[img:img + 1, sl]), nl, pad_row,
                pad_row)).ravel())
        host = encode_global(np.concatenate(parts_s),
                             np.concatenate(parts_r), nl, rows, lengths,
                             offsets)
        # header flag bits differ (v4 marks itself); bodies must be equal
        assert host[4:] == enc["strings"][0][img][4:], f"image {img}"


def test_v3_stream_still_decodes_through_unified_codec(tiny_codec):
    model, params, x, codec = tiny_codec
    import os
    os.environ["MLIC_UNIFIED_Z"] = "0"
    try:
        c3 = Codec(model, params, backend="device", n_lanes=32)
        c3.update()
    finally:
        os.environ.pop("MLIC_UNIFIED_Z")
    enc3 = c3.compress(x)
    assert not stream_is_unified(enc3["strings"][0][0])
    dec = codec.decompress(enc3["strings"], enc3["shape"])
    np.testing.assert_array_equal(np.asarray(enc3["y_hat"]),
                                  np.asarray(dec["y_hat"]))


def test_unified_vbr_variable_z_step_roundtrip():
    """VBR with a variable-rate bottleneck: per-level EB rows swap inside
    the SAME compiled v4 programs (tables are traced args)."""
    base = get_model("MLICPP_TINY_VBR")
    model = type(base)(cfg=dataclasses.replace(base.cfg, vr_entbttlnck=True))
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(6), "noise": jax.random.key(7)}, x)["params"]
    codec = Codec(model, params, backend="device", n_lanes=32)
    codec.update()
    assert codec.unified_z
    for s in (0, 2):
        enc = codec.compress(x, s=s)
        assert all(e == b"" for e in enc["strings"][1])
        dec = codec.decompress(enc["strings"], enc["shape"], s=s)
        np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                      np.asarray(dec["y_hat"]))
