"""On-device interleaved rANS ENCODE: byte parity with the C++ encoder.

The device encoder (``device_rans.encode_lanes`` + ``compact_streams``)
must reproduce ``coder.encode_interleaved``'s stream bytes exactly — then
every existing decode path (host oracle, device scan) keeps working and
encode downloads shrink to ~compressed size.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mlic_tpu.entropy import parametric
from mlic_tpu.entropy.device_rans import (device_tables,
                                          encode_interleaved_device,
                                          parametric_device_tables)
from mlic_tpu.entropy.rans.coder import decode_interleaved, encode_interleaved


@pytest.fixture(scope="module")
def tabs():
    scales = np.exp(np.linspace(np.log(0.11), np.log(64.0), 16))
    params, lengths, offsets = parametric.gaussian_row_params(scales)
    table = parametric.generate_tables(params, lengths)
    assert parametric.validate_tables(table, lengths)
    return params, table, lengths, offsets


def _assemble(out, n_lanes, batch):
    """Per-image streams from the compact_streams dict (mirrors
    Codec._download_streams)."""
    lane_begin = np.asarray(out["lane_begin"])
    lane_n = np.asarray(out["lane_n"])
    ecount = np.asarray(out["ecount"])
    buf = np.asarray(out["buf"])
    ebuf = np.asarray(out["ebuf"])
    eb = np.concatenate([[0], np.cumsum(ecount)]).astype(np.int64)
    streams = []
    for b in range(batch):
        lo, hi = b * n_lanes, (b + 1) * n_lanes
        w0 = int(lane_begin[lo])
        w1 = int(lane_begin[hi - 1] + lane_n[hi - 1])
        begins = (lane_begin[lo:hi] - w0).astype(np.uint32)
        header = np.asarray([n_lanes, w1 - w0, int(ecount[b])],
                            np.uint32).tobytes()
        body = begins.tobytes() + buf[w0:w1].tobytes()
        if len(body) % 4:
            body += b"\x00\x00"
        streams.append(header + body
                       + ebuf[eb[b]:eb[b + 1]].astype(np.int32).tobytes())
    return streams


def _random_payload(tabs, rng, n, esc_rate=0.0):
    params, table, lengths, offsets = tabs
    n_rows = len(lengths) - 1  # exclude the pad row
    idx = rng.integers(0, n_rows, n).astype(np.int32)
    span = (lengths[idx] - 2)
    sym = (offsets[idx] + rng.integers(0, span)).astype(np.int32)
    if esc_rate:
        mask = rng.random(n) < esc_rate
        sym[mask] = rng.integers(-3000, 3000, mask.sum())
    return sym, idx


def test_divmod_u32_exact_at_boundaries():
    """The scan's reciprocal-multiply divmod must be exact for every
    admissible (x, fr): x < fr * 2^16, fr in [1, 2^16].  Stress the
    q-boundary region (x = q*fr + {0, 1, fr-1}) where the float estimate
    can land on either side, across the full freq range incl. 1, 2,
    powers of two, 2^16, and odd values."""
    import jax

    from mlic_tpu.entropy.device_rans import _divmod_u32

    rng = np.random.default_rng(42)
    frs = np.unique(np.concatenate([
        np.asarray([1, 2, 3, 5, 7, 255, 256, 257, 65535, 65536]),
        2 ** np.arange(17),
        rng.integers(1, 65537, 200),
    ])).astype(np.uint64)
    xs, fs = [], []
    for fr in frs:
        qmax = (fr << 16) - 1  # x < fr * 2^16  ->  q <= 2^16 - 1
        qs = np.unique(np.concatenate([
            np.asarray([0, 1, 2]), rng.integers(0, 1 << 16, 50),
            np.asarray([(1 << 16) - 1])]))
        for q in qs:
            for rr in (0, 1, int(fr) - 1):
                x = q * int(fr) + rr
                if rr < fr and x <= qmax and x < (1 << 32):
                    xs.append(x)
                    fs.append(int(fr))
    x = jnp.asarray(np.asarray(xs, np.uint32))
    fr = jnp.asarray(np.asarray(fs, np.uint32))
    rcp = 1.0 / fr.astype(jnp.float32)
    q, r = jax.jit(_divmod_u32)(x, fr, rcp)
    xs64 = np.asarray(xs, np.uint64)
    fs64 = np.asarray(fs, np.uint64)
    np.testing.assert_array_equal(np.asarray(q, np.uint64), xs64 // fs64)
    np.testing.assert_array_equal(np.asarray(r, np.uint64), xs64 % fs64)


@pytest.mark.parametrize("mode", ["lut", "parametric"])
@pytest.mark.parametrize("esc_rate", [0.0, 0.03])
def test_single_image_byte_parity(tabs, mode, esc_rate):
    params, table, lengths, offsets = tabs
    n_lanes, n = 32, 32 * 40
    rng = np.random.default_rng(5)
    sym, idx = _random_payload(tabs, rng, n, esc_rate)

    host = encode_interleaved(sym, idx, n_lanes, table, lengths, offsets)

    dev_tabs = (parametric_device_tables(params, lengths, offsets, table)
                if mode == "parametric"
                else device_tables(table, lengths, offsets))
    out = encode_interleaved_device(jnp.asarray(sym[None]),
                                    jnp.asarray(idx[None]),
                                    dev_tabs, n_lanes, n_phases=1)
    stream = _assemble(out, n_lanes, 1)[0]
    assert stream == host
    # and it decodes back
    got = decode_interleaved(stream, idx, table, lengths, offsets)
    np.testing.assert_array_equal(got, sym)


def test_multi_image_multi_phase_byte_parity(tabs):
    params, table, lengths, offsets = tabs
    n_lanes, n_per, phases, batch = 16, 16 * 9 + 5, 4, 3  # ragged phase size
    rng = np.random.default_rng(9)
    pad_row = len(lengths) - 1
    sym = np.stack([_random_payload(tabs, rng, n_per * phases, 0.02)[0]
                    for _ in range(batch)])
    idx = np.stack([_random_payload(tabs, rng, n_per * phases, 0.0)[1]
                    for _ in range(batch)])

    # Host reference: per image, concatenate per-phase lane-padded blocks.
    host_streams = []
    for b in range(batch):
        ss, ii = [], []
        for k in range(phases):
            s = sym[b, k * n_per:(k + 1) * n_per]
            i = idx[b, k * n_per:(k + 1) * n_per]
            pad = (-len(s)) % n_lanes
            ss.append(np.concatenate([s, np.zeros(pad, np.int32)]))
            ii.append(np.concatenate([i, np.full(pad, pad_row, np.int32)]))
        host_streams.append(encode_interleaved(
            np.concatenate(ss), np.concatenate(ii), n_lanes,
            table, lengths, offsets))

    dev_tabs = parametric_device_tables(params, lengths, offsets, table)
    out = encode_interleaved_device(jnp.asarray(sym), jnp.asarray(idx),
                                    dev_tabs, n_lanes, n_phases=phases)
    streams = _assemble(out, n_lanes, batch)
    for b in range(batch):
        assert streams[b] == host_streams[b], f"image {b} differs"


def _assemble_global(out, n_lanes, batch):
    """Per-image format-v3 streams from the compact_streams_global dict
    (mirrors Codec._download_streams)."""
    from mlic_tpu.entropy.rans.coder import _V3_FLAG
    img_n = np.asarray(out["img_n"])
    ecount = np.asarray(out["ecount"])
    buf = np.asarray(out["buf"])
    ebuf = np.asarray(out["ebuf"])
    img_begin = np.concatenate([[0], np.cumsum(img_n)[:-1]]).astype(np.int64)
    eb = np.concatenate([[0], np.cumsum(ecount)]).astype(np.int64)
    streams = []
    for b in range(batch):
        w0, w1 = int(img_begin[b]), int(img_begin[b] + img_n[b])
        header = np.asarray([np.uint32(n_lanes) | _V3_FLAG, w1 - w0,
                             int(ecount[b])], np.uint32).tobytes()
        body = buf[w0:w1].tobytes()
        if len(body) % 4:
            body += b"\x00\x00"
        streams.append(header + body
                       + ebuf[eb[b]:eb[b + 1]].astype(np.int32).tobytes())
    return streams


@pytest.mark.parametrize("esc_rate", [0.0, 0.03])
def test_global_format_byte_parity_and_oracle(tabs, esc_rate):
    """Format v3: device encoder bytes == numpy ``encode_global`` bytes;
    the per-symbol ``decode_global`` oracle recovers the symbols; and the
    stream is 4 B/lane smaller than the v2 stream of the same payload."""
    from mlic_tpu.entropy.rans.coder import (decode_global, encode_global,
                                             stream_is_global)
    params, table, lengths, offsets = tabs
    n_lanes, n_per, phases, batch = 16, 16 * 9 + 5, 4, 3
    rng = np.random.default_rng(11)
    pad_row = len(lengths) - 1
    sym = np.stack([_random_payload(tabs, rng, n_per * phases, esc_rate)[0]
                    for _ in range(batch)])
    idx = np.stack([_random_payload(tabs, rng, n_per * phases, 0.0)[1]
                    for _ in range(batch)])

    host_streams, padded_idx = [], []
    for b in range(batch):
        ss, ii = [], []
        for k in range(phases):
            s = sym[b, k * n_per:(k + 1) * n_per]
            i = idx[b, k * n_per:(k + 1) * n_per]
            pad = (-len(s)) % n_lanes
            ss.append(np.concatenate([s, np.zeros(pad, np.int32)]))
            ii.append(np.concatenate([i, np.full(pad, pad_row, np.int32)]))
        host_streams.append(encode_global(
            np.concatenate(ss), np.concatenate(ii), n_lanes,
            table, lengths, offsets))
        padded_idx.append(np.concatenate(ii))

    dev_tabs = parametric_device_tables(params, lengths, offsets, table)
    out = encode_interleaved_device(jnp.asarray(sym), jnp.asarray(idx),
                                    dev_tabs, n_lanes, n_phases=phases,
                                    fmt="global")
    streams = _assemble_global(out, n_lanes, batch)
    per_step = -(-n_per // n_lanes) * n_lanes
    for b in range(batch):
        assert stream_is_global(streams[b])
        assert streams[b] == host_streams[b], f"image {b} differs"
        got = decode_global(streams[b], padded_idx[b], table, lengths,
                            offsets)
        got = got.reshape(phases, per_step)[:, :n_per].ravel()
        np.testing.assert_array_equal(got, sym[b])
        # v2 of the same payload carries a 4 B/lane begin table v3 drops
        v2 = encode_interleaved(
            np.concatenate([np.concatenate(
                [sym[b, k * n_per:(k + 1) * n_per],
                 np.zeros((-n_per) % n_lanes, np.int32)])
                for k in range(phases)]),
            padded_idx[b], n_lanes, table, lengths, offsets)
        assert len(v2) - len(streams[b]) == 4 * n_lanes


def test_global_device_decode_matches_oracle(tabs):
    """Device ``fmt="global"`` decode over a multi-image concatenated
    buffer recovers the symbols (incl. escapes via the side channel)."""
    from mlic_tpu.entropy.device_rans import make_decoder
    from mlic_tpu.entropy.rans.coder import parse_global
    params, table, lengths, offsets = tabs
    n_lanes, n_per, phases, batch = 8, 8 * 6, 3, 2
    rng = np.random.default_rng(13)
    pad_row = len(lengths) - 1
    sym = np.stack([_random_payload(tabs, rng, n_per * phases, 0.05)[0]
                    for _ in range(batch)])
    idx = np.stack([_random_payload(tabs, rng, n_per * phases, 0.0)[1]
                    for _ in range(batch)])
    dev_tabs = parametric_device_tables(params, lengths, offsets, table)
    out = encode_interleaved_device(jnp.asarray(sym), jnp.asarray(idx),
                                    dev_tabs, n_lanes, n_phases=phases,
                                    fmt="global")
    streams = _assemble_global(out, n_lanes, batch)

    words_list, img_begins, escs, esc_begins = [], [], [], []
    off = eoff = 0
    for b in range(batch):
        nl, wds, esc = parse_global(streams[b])
        assert nl == n_lanes
        words_list.append(wds)
        img_begins.append(off)
        off += len(wds)
        escs.append(esc)
        esc_begins.append(eoff)
        eoff += len(esc)
    words = np.zeros(1 << 12, np.uint16)
    cat = np.concatenate(words_list)
    words[:len(cat)] = cat
    esc_values = np.zeros(max(eoff, 1), np.int32)
    if eoff:
        esc_values[:eoff] = np.concatenate(escs)
    init, decode = make_decoder(
        jnp.asarray(words), esc_values=jnp.asarray(esc_values),
        esc_begin=jnp.asarray(np.asarray(esc_begins, np.int32)),
        fmt="global", n_lanes=n_lanes)
    carry = init(jnp.asarray(np.asarray(img_begins, np.int32)))
    steps = n_per // n_lanes
    got = np.zeros_like(sym)
    for k in range(phases):
        i = idx[:, k * n_per:(k + 1) * n_per]
        ordered = i.reshape(batch, steps, n_lanes).transpose(1, 0, 2).reshape(-1)
        carry, s = decode(carry, jnp.asarray(ordered), dev_tabs)
        got[:, k * n_per:(k + 1) * n_per] = (
            np.asarray(s).reshape(steps, batch, n_lanes)
            .transpose(1, 0, 2).reshape(batch, -1))
    np.testing.assert_array_equal(got, sym)


def test_corrupt_stream_decodes_without_crash():
    """rANS has no integrity check: corrupted or truncated v3 streams must
    decode to arbitrary symbols (finite tensors), never crash."""
    import jax

    from mlic_tpu.codec import Codec
    from mlic_tpu.models.registry import get_model

    model = get_model("MLICPP_TINY")
    x = np.asarray(jax.random.uniform(jax.random.key(0), (1, 64, 64, 3)),
                   np.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)},
        jnp.asarray(x))["params"]
    codec = Codec(model, params, backend="device", n_lanes=16)
    codec.update()
    enc = codec.compress(x)
    good = enc["strings"][0][0]

    # flip bytes in the word payload (header intact)
    corrupt = bytearray(good)
    for i in range(16, min(len(corrupt), 64)):
        corrupt[i] ^= 0xA5
    streams = [[bytes(corrupt)], enc["strings"][1]]
    dec = codec.decompress(streams, enc["shape"])
    assert np.isfinite(np.asarray(dec["x_hat"])).all()

    # truncate the payload (claimed n_words exceeds actual bytes)
    trunc = good[:max(16, len(good) // 2)]
    dec2 = codec.decompress([[trunc], enc["strings"][1]], enc["shape"])
    assert np.isfinite(np.asarray(dec2["x_hat"])).all()


def test_codec_device_encode_roundtrip_and_stream_parity():
    """Full-codec integration: device-encoded streams are byte-identical to
    host-encoded ones and round-trip bit-exactly.

    Runs on format v3 (MLIC_UNIFIED_Z=0): flipping ``device_encode`` off
    routes through the host v3 assembler, so byte parity is only defined
    there.  The v4 host-oracle parity lives in tests/test_unified_stream.py.
    """
    import os

    import jax

    from mlic_tpu.codec import Codec
    from mlic_tpu.models.registry import get_model

    model = get_model("MLICPP_TINY")
    x = np.asarray(jax.random.uniform(jax.random.key(0), (2, 64, 64, 3)),
                   np.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)},
        jnp.asarray(x))["params"]

    os.environ["MLIC_UNIFIED_Z"] = "0"
    try:
        codec = Codec(model, params, backend="device", n_lanes=32)
    finally:
        os.environ.pop("MLIC_UNIFIED_Z")
    codec.update()
    assert codec.device_encode
    assert not codec.unified_z
    enc_dev = codec.compress(x)

    codec.device_encode = False
    enc_host = codec.compress(x)
    assert enc_dev["strings"][0] == enc_host["strings"][0]
    assert enc_dev["strings"][1] == enc_host["strings"][1]

    dec = codec.decompress(enc_dev["strings"], enc_dev["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc_dev["x_hat"]))


def test_compress_begin_end_pipeline_interleaving():
    """The begin/end split must round-trip when batches are interleaved the
    way the serving pipeline does (begin(i+1) dispatched before end(i))."""
    import jax

    from mlic_tpu.codec import Codec
    from mlic_tpu.models.registry import get_model

    model = get_model("MLICPP_TINY")
    xs = [np.asarray(jax.random.uniform(jax.random.key(k), (2, 64, 64, 3)),
                     np.float32) for k in range(3)]
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(9), "noise": jax.random.key(10)},
        jnp.asarray(xs[0]))["params"]

    codec = Codec(model, params, backend="device", n_lanes=32)
    codec.update()
    # Reference results: plain sequential compress.
    ref = [codec.compress(x) for x in xs]

    # Pipelined: all begins dispatched before the matching ends.
    handles = [codec.compress_begin(x) for x in xs]
    encs = [codec.compress_end(h) for h in handles]
    for e, r in zip(encs, ref):
        assert e["strings"][0] == r["strings"][0]
        assert e["strings"][1] == r["strings"][1]
        dec = codec.decompress(e["strings"], e["shape"])
        np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                      np.asarray(r["x_hat"]))


def test_split_encode_matches_single_program():
    """The two-dispatch encode chain (split_encode, default) must produce
    byte-identical streams to the single-program encode on BOTH stream
    formats (v4 unified and v3) — the split exists purely to give the
    prep chain its own fusion pass (make_encode_rans docstring)."""
    import os

    import jax

    from mlic_tpu.codec import Codec
    from mlic_tpu.models.registry import get_model

    model = get_model("MLICPP_TINY")
    x = np.asarray(jax.random.uniform(jax.random.key(3), (2, 64, 64, 3)),
                   np.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(4), "noise": jax.random.key(5)},
        jnp.asarray(x))["params"]

    for uz in ("1", "0"):
        os.environ["MLIC_UNIFIED_Z"] = uz
        try:
            c_split = Codec(model, params, backend="device", n_lanes=16)
            c_one = Codec(model, params, backend="device", n_lanes=16)
        finally:
            os.environ.pop("MLIC_UNIFIED_Z")
        c_split.split_encode = True
        c_one.split_encode = False
        c_split.update()
        c_one.update()
        r1 = c_split.compress(x)
        r2 = c_one.compress(x)
        assert r1["strings"][0] == r2["strings"][0], f"y streams differ uz={uz}"
        assert r1["strings"][1] == r2["strings"][1], f"z streams differ uz={uz}"
        dec = c_one.decompress(r1["strings"], r1["shape"])
        np.testing.assert_array_equal(np.asarray(dec["y_hat"]),
                                      np.asarray(r1["y_hat"]))
