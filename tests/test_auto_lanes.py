"""Size-adaptive rANS lane count: ``Codec(n_lanes="auto")`` (the default).

Interleaved-rANS state costs 4 B/lane/image and every phase pads to a
lane multiple, so small images want narrow codecs (ROADMAP "lane
adaptivity").  Auto resolution: from the image size on compress
(``codec.auto_lanes``), from the self-describing stream header on
decompress — a decode-only codec follows whatever width the encoder
chose (previously a hard assert failure on mismatch).
"""

import jax
import numpy as np
import pytest

from mlic_tpu.codec import Codec, auto_lanes
from mlic_tpu.models.registry import get_model


@pytest.fixture(scope="module")
def tiny():
    model = get_model("MLICPP_TINY")
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    return model, params, x


def test_auto_lanes_formula():
    cfg = get_model("MLICPP_S").cfg
    # saturates at the historical fixed default on bench-sized frames
    assert auto_lanes(cfg, 768, 512) == 256
    assert auto_lanes(cfg, 512, 768) == 256
    small = auto_lanes(cfg, 64, 64)
    assert 16 <= small < 256
    # power of two, monotone in image area, clamped
    prev = 0
    for side in (1, 64, 128, 256, 512, 2048):
        lanes = auto_lanes(cfg, side, side)
        assert lanes & (lanes - 1) == 0
        assert 16 <= lanes <= 256
        assert lanes >= prev
        prev = lanes


def test_auto_small_image_smaller_stream_bit_exact(tiny):
    """Auto codec on a 64x64 tile: strictly smaller stream than the old
    256-lane default, same reconstruction, bit-exact round trip."""
    model, params, x = tiny
    c_auto = Codec(model, params, backend="device")  # n_lanes defaults auto
    c_auto.update()
    enc_a = c_auto.compress(x)
    assert c_auto.n_lanes is not None and c_auto.n_lanes < 256
    c_wide = Codec(model, params, backend="device", n_lanes=256)
    c_wide.update()
    enc_w = c_wide.compress(x)
    np.testing.assert_array_equal(np.asarray(enc_a["x_hat"]),
                                  np.asarray(enc_w["x_hat"]))
    assert len(enc_a["strings"][0][0]) < len(enc_w["strings"][0][0])
    dec = c_auto.decompress(enc_a["strings"], enc_a["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc_a["x_hat"]))


def test_decode_only_codec_follows_stream_lanes(tiny):
    """A decode-first auto codec resolves its lane count from the header
    and decodes a foreign-width stream bit-exactly (tools/decode.py
    scenario: the decoder process never sees the encoder's config)."""
    model, params, x = tiny
    c_enc = Codec(model, params, backend="device", n_lanes=64)
    c_enc.update()
    enc = c_enc.compress(x)
    c_dec = Codec(model, params, backend="device")
    c_dec.update()
    dec = c_dec.decompress(enc["strings"], enc["shape"])
    assert c_dec.n_lanes == 64
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc["x_hat"]))


def test_steps_backend_auto_roundtrip(tiny):
    """The steps backend resolves lanes from the image size on compress
    (its y streams are raw single-stream rANS with NO lane header, and its
    decode path never reads a lane count)."""
    model, params, x = tiny
    codec = Codec(model, params, backend="steps")
    codec.update()
    enc = codec.compress(x)
    assert codec.n_lanes is not None and codec.n_lanes < 256
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc["x_hat"]))


def test_steps_decode_only_codec_ignores_headerless_streams(tiny):
    """A decode-only steps codec (tools/decode.py default) must NOT read a
    lane count out of its headerless streams — previously entropy-coded
    payload bytes parsed as garbage lane counts (ADVICE r3)."""
    model, params, x = tiny
    c_enc = Codec(model, params, backend="steps")
    c_enc.update()
    enc = c_enc.compress(x)
    c_dec = Codec(model, params, backend="steps")  # fresh, auto, decode-first
    c_dec.update()
    dec = c_dec.decompress(enc["strings"], enc["shape"])
    assert c_dec.n_lanes is None  # steps decode never needs (or fakes) one
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc["x_hat"]))


def test_auto_codec_rejects_corrupt_lane_header(tiny):
    """Corrupted/truncated headers must raise a clean ValueError before
    they drive jit program construction (device decode-only auto codec)."""
    model, params, x = tiny
    c_enc = Codec(model, params, backend="device", n_lanes=16)
    c_enc.update()
    enc = c_enc.compress(x)
    good = enc["strings"][0][0]

    # implausible lane count in the header (flags preserved)
    head = np.frombuffer(good[:4], np.uint32)[0]
    flags = head & np.uint32(0xC0000000)
    bad_head = np.asarray([np.uint32(491077105) & np.uint32(0x3FFFFFFF)
                           | flags], np.uint32).tobytes()
    corrupt = bad_head + good[4:]
    c_dec = Codec(model, params, backend="device")
    c_dec.update()
    with pytest.raises(ValueError, match="lane count"):
        c_dec.decompress([[corrupt], enc["strings"][1]], enc["shape"])

    # stream truncated below the header size
    c_dec2 = Codec(model, params, backend="device")
    c_dec2.update()
    with pytest.raises(ValueError, match="too short"):
        c_dec2.decompress([[good[:2]], enc["strings"][1]], enc["shape"])


def test_codec_rejects_non_pow2_lanes(tiny):
    model, params, _ = tiny
    with pytest.raises(ValueError, match="power of two"):
        Codec(model, params, backend="device", n_lanes=24)
    with pytest.raises(ValueError, match="power of two"):
        Codec(model, params, backend="device", n_lanes=8192)


def test_auto_codec_warns_on_much_larger_image(tiny):
    """Sticky auto resolution: a codec that resolved on a small tile warns
    (once) when it later sees an image that wants a much wider codec."""
    import warnings

    model, params, x = tiny
    codec = Codec(model, params, backend="steps")
    codec.update()
    codec.compress(x)  # resolves narrow from the 64^2 tile
    big = np.tile(np.asarray(x), (1, 8, 8, 1))  # 512^2 wants >= 4x lanes
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        codec.compress(big)
        codec.compress(big)  # second time: already warned, stays silent
    msgs = [w for w in rec if "lane count is fixed" in str(w.message)]
    assert len(msgs) == 1
