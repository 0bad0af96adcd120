"""Eval-harness tests: padded file round trips, VBR level loop, blur loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlic_tpu import eval as ev
from mlic_tpu.codec import Codec
from mlic_tpu.models.config import ModelConfig
from mlic_tpu.models.registry import get_model
from mlic_tpu.models.vbr import MLICPlusPlusVbr


def test_pad_crop_roundtrip():
    x = np.random.default_rng(0).random((1, 200, 280, 3)).astype(np.float32)
    padded, hw = ev.pad_to_multiple(x)
    assert padded.shape[1] % 64 == 0 and padded.shape[2] % 64 == 0
    np.testing.assert_array_equal(ev.crop_to(padded, hw), x)


def test_gaussian_blur_shrinks_detail():
    rng = np.random.default_rng(1)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    b = ev._gaussian_blur(x)
    assert b.shape == x.shape
    # blur reduces high-frequency energy
    assert np.var(np.diff(b, axis=1)) < np.var(np.diff(x, axis=1))


@pytest.mark.parametrize("backend", ["steps", "device"])
def test_evaluate_codec_end_to_end(tmp_path, backend):
    model = get_model("MLICPP_TINY")
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    codec = Codec(model, params, backend=backend, n_lanes=32)
    codec.update()
    imgs = [np.asarray(jax.random.uniform(jax.random.key(7 + i), (70, 90, 3)))
            for i in range(2)]  # odd sizes exercise the pad path
    out = ev.evaluate_codec(codec, imgs, str(tmp_path / backend), log=lambda *_: None)
    assert out["n_images"] == 2
    assert out["bpp"] > 0 and np.isfinite(out["psnr"])


def test_evaluate_codec_vbr_levels(tmp_path):
    cfg = ModelConfig("T_VBR", N=32, M=64, slice_num=2, vbr=True,
                      lmbda=(0.0018, 0.0483), gain_init=(0.15, 1.0))
    model = MLICPlusPlusVbr(cfg=cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    codec = Codec(model, params)
    codec.update()
    imgs = [np.asarray(jax.random.uniform(jax.random.key(9), (64, 64, 3)))]
    res = ev.evaluate_codec_vbr(codec, imgs, str(tmp_path), log=lambda *_: None)
    assert set(res) == {0, 1}
    # lower gain level -> fewer bits
    assert res[0]["bpp"] <= res[1]["bpp"]
