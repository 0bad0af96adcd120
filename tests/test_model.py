"""End-to-end model tests on the TINY config: forward, round-trip, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.codec import Codec
from mlic_tpu.data.folder import synthetic_batches
from mlic_tpu.loss import rate_distortion_loss
from mlic_tpu.models.mlicpp import MLICPlusPlus
from mlic_tpu.models.registry import get_model
from mlic_tpu.train.trainer import TrainConfig, create_train_state, make_train_step


@pytest.fixture(scope="module")
def tiny():
    model = get_model("MLICPP_TINY")
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    return model, params, x


def test_forward_shapes_and_loss(tiny):
    model, params, x = tiny
    out = jax.jit(lambda p, v: model.apply({"params": p}, v, True,
                                           rngs={"noise": jax.random.key(3)}))(params, x)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (1, 4, 4, model.cfg.M)
    assert out["likelihoods"]["z"].shape == (1, 1, 1, model.cfg.N)
    loss = rate_distortion_loss(out, x, 0.013)
    assert np.isfinite(float(loss["loss"]))
    assert float(loss["bpp_loss"]) > 0


def test_eval_forward_deterministic(tiny):
    model, params, x = tiny
    f = jax.jit(lambda p, v: model.apply({"params": p}, v, False))
    a = f(params, x)
    b = f(params, x)
    np.testing.assert_array_equal(np.asarray(a["x_hat"]), np.asarray(b["x_hat"]))


def test_compress_decompress_bit_exact(tiny):
    """The keystone property: compress -> decompress reproduces the encoder's
    y_hat and x_hat bit-for-bit (cf. SURVEY.md §4 test plan)."""
    model, params, x = tiny
    codec = Codec(model, params)
    codec.update()
    enc = codec.compress(x)
    assert len(enc["strings"]) == 2
    assert len(enc["strings"][0][0]) > 0 and len(enc["strings"][1][0]) > 0
    dec = codec.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(enc["y_hat"]), np.asarray(dec["y_hat"]))
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"]))


def test_compress_different_images_roundtrip(tiny):
    model, params, _ = tiny
    codec = Codec(model, params)
    codec.update()
    for seed in (5, 6):
        x = jax.random.uniform(jax.random.key(seed), (1, 64, 64, 3))
        enc = codec.compress(x)
        dec = codec.decompress(enc["strings"], enc["shape"])
        np.testing.assert_array_equal(np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"]))


def test_steps_and_fused_backends_agree(tiny):
    """The per-slice steps backend and the fused io_callback backend are
    different XLA programs built from the same math; this asserts they emit
    identical bitstreams and cross-decode bit-exactly (empirical evidence
    that program structure does not perturb the entropy parameters)."""
    model, params, x = tiny
    c_steps = Codec(model, params, backend="steps")
    c_steps.update()
    c_fused = Codec(model, params, backend="fused")
    c_fused.update()
    e1 = c_steps.compress(x)
    e2 = c_fused.compress(x)
    assert e1["strings"][0][0] == e2["strings"][0][0]
    assert e1["strings"][1][0] == e2["strings"][1][0]
    d = c_fused.decompress(e1["strings"], e1["shape"])
    np.testing.assert_array_equal(np.asarray(d["x_hat"]), np.asarray(e1["x_hat"]))


def test_batched_codec_matches_single(tiny):
    """B images coded in one pass produce the same per-image bitstreams as
    coding each alone, and batched decompress is bit-exact."""
    model, params, _ = tiny
    codec = Codec(model, params)
    codec.update()
    xs = jax.random.uniform(jax.random.key(9), (3, 64, 64, 3))
    enc_b = codec.compress(xs)
    assert len(enc_b["strings"][0]) == 3 and len(enc_b["strings"][1]) == 3
    for b in range(3):
        enc_1 = codec.compress(xs[b:b + 1])
        assert enc_1["strings"][0][0] == enc_b["strings"][0][b]
        assert enc_1["strings"][1][0] == enc_b["strings"][1][b]
    dec_b = codec.decompress(enc_b["strings"], enc_b["shape"])
    np.testing.assert_array_equal(np.asarray(dec_b["x_hat"]),
                                  np.asarray(enc_b["x_hat"]))


def test_device_backend_roundtrip(tiny):
    """On-device rANS decompress: encode (steps executables, interleaved
    flush) -> single-program device decode must reproduce the encoder's
    reconstruction bit-exactly, and match the steps-backend decode."""
    model, params, x = tiny
    c_dev = Codec(model, params, backend="device", n_lanes=32)
    c_dev.update()
    xs = jax.random.uniform(jax.random.key(11), (2, 64, 64, 3))
    enc = c_dev.compress(xs)
    dec = c_dev.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(np.asarray(dec["y_hat"]), np.asarray(enc["y_hat"]))
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]), np.asarray(enc["x_hat"]))


def test_rate_estimate_matches_file(tiny):
    """The likelihood-estimated rate (eval forward) must track the actual
    coded file size: same CDF tables feed both, so a big gap means broken
    table construction.  Allows coder overhead (lane flush + per-symbol
    quantization loss) of ~10% + fixed bytes."""
    model, params, x = tiny
    codec = Codec(model, params, backend="steps")
    codec.update()
    out = jax.jit(lambda p, v: model.apply({"params": p}, v, False))(params, x)
    from mlic_tpu.loss import rate_distortion_loss
    est_bpp = float(rate_distortion_loss(out, x, 0.013)["bpp_loss"])
    enc = codec.compress(x)
    real_bpp = 8 * sum(len(s) for g in enc["strings"] for s in g) / (64 * 64)
    assert real_bpp < est_bpp * 1.10 + 0.05, (est_bpp, real_bpp)
    assert real_bpp > est_bpp * 0.90 - 0.05, (est_bpp, real_bpp)


def test_net_decoder_forward(tiny):
    model, params, x = tiny
    out = jax.jit(lambda p, v: model.apply({"params": p}, v,
                                           method=MLICPlusPlus.net_decoder_forward))(params, x)
    assert out.shape == x.shape


def test_training_reduces_loss():
    model = get_model("MLICPP_TINY")
    cfg = TrainConfig(lmbda=0.013, learning_rate=3e-4, seed=0)
    state, tx = create_train_state(model, cfg, input_shape=(2, 64, 64, 3))
    step = make_train_step(model, tx, cfg)
    losses = []
    for batch in synthetic_batches(2, 64, steps=25, seed=1):
        state, metrics = step(state, jnp.asarray(batch))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
