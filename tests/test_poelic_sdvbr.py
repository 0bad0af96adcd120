"""VERDICT round-1 gap tests: the POELIC perceptual training step and the
combined small-decoder + VBR variant (MLICPP_M_SMALL_DEC_VBR shape).

Reference: ``MLIC++/playground/compression_trainer.py:733-736`` (POELIC
trainer) and ``models/mlicpp_sd_vbr.py`` (SD+VBR model).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.codec import Codec
from mlic_tpu.models.config import ModelConfig
from mlic_tpu.models.vbr import MLICPlusPlusVbr


TINY_SD_VBR = ModelConfig("TINY_SD_VBR", N=32, M=64, slice_num=2,
                          small_decoder=True, vbr=True,
                          lmbda=(0.0005, 0.0483, 0.18),
                          gain_init=(0.066, 0.518, 1.0),
                          quant_offset=True, vr_entbttlnck=True)


@pytest.fixture(scope="module")
def sd_vbr():
    model = MLICPlusPlusVbr(cfg=TINY_SD_VBR)
    x = jax.random.uniform(jax.random.key(3), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(4), "noise": jax.random.key(5)}, x)["params"]
    return model, params, x


def test_sd_vbr_forward_all_levels(sd_vbr):
    model, params, x = sd_vbr
    f = jax.jit(lambda p, v, s: model.apply({"params": p}, v, False, 2, s))
    for s in range(3):
        out = f(params, x, jnp.asarray(s))
        assert out["x_hat"].shape == x.shape
        assert np.isfinite(np.asarray(out["x_hat"])).all()
    # small decoder: hyper synthesis shrunk to M//4 channels
    hs = params["h_s"]
    last = (hs["c2"]["dw"]["point"]["kernel"] if "dw" in hs["c2"]
            else hs["c2"]["conv"]["kernel"])
    assert last.shape[-1] == 2 * (TINY_SD_VBR.M // 4)
    # vr_entbttlnck: the z-step MLP exists
    assert "zqstep_0" in params


def test_sd_vbr_codec_roundtrip(sd_vbr):
    model, params, x = sd_vbr
    codec = Codec(model, params, backend="steps")
    codec.update()
    for s in (0, 2):
        enc = codec.compress(np.asarray(x), s=s)
        dec = codec.decompress(enc["strings"], enc["shape"], s=s)
        np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                      np.asarray(dec["x_hat"]))


def test_poelic_train_step_runs_and_updates():
    from mlic_tpu.models.registry import get_model
    from mlic_tpu.perceptual import Vgg16Features
    from mlic_tpu.train.trainer import (TrainConfig, create_train_state,
                                        make_poelic_train_step)

    model = get_model("MLICPP_TINY")
    cfg = TrainConfig(lmbda=0.0483, learning_rate=1e-4)
    state, tx = create_train_state(model, cfg, input_shape=(2, 64, 64, 3))

    vgg = Vgg16Features()
    x0 = jnp.zeros((1, 64, 64, 3))
    vgg_params = jax.jit(vgg.init)(jax.random.key(0), x0)["params"]
    vgg_apply = lambda p, v: vgg.apply({"params": p}, v)

    step = make_poelic_train_step(model, tx, cfg, vgg_apply, vgg_params)
    batch = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    new_state, metrics = step(state, batch)
    for k in ("loss", "charbonnier_loss", "perceptual_loss", "style_loss",
              "bpp_loss", "aux_loss"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(new_state.params)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
