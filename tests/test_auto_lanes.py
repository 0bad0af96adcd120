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
    """The host-coder backend resolves lanes the same way (its v3 streams
    pay the same per-lane state)."""
    model, params, x = tiny
    codec = Codec(model, params, backend="steps")
    codec.update()
    enc = codec.compress(x)
    assert codec.n_lanes is not None and codec.n_lanes < 256
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(enc["x_hat"]))
