"""Model-variant structure tests: small decoder, dense convs, old synthesis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.models.config import ModelConfig
from mlic_tpu.models.mlicpp import MLICPlusPlus


def _init_and_forward(cfg):
    model = MLICPlusPlus(cfg=cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    out = jax.jit(lambda p, v: model.apply({"params": p}, v, False))(params, x)
    return model, params, out


def test_small_decoder_variant():
    cfg = ModelConfig("TINY_SD", N=32, M=64, slice_num=2, small_decoder=True)
    model, params, out = _init_and_forward(cfg)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    # hyper synthesis shrunk to M//4: its last conv produces 2*(M//4) channels
    hs = params["h_s"]
    last = hs["c2"]["dw"]["point"]["kernel"] if "dw" in hs["c2"] else hs["c2"]["conv"]["kernel"]
    assert last.shape[-1] == 2 * (cfg.M // 4)
    # LRP is the wide "Old" structure: 4 convs (c0..c3)
    assert "c3" in params["lrp_anchor_0"]


def test_dense_conv_variant():
    cfg = ModelConfig("TINY_DENSE", N=32, M=64, slice_num=2, depthwise=False)
    model, params, out = _init_and_forward(cfg)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    # g_a first conv is a dense 3x3 (no depthwise split)
    assert "conv" in params["g_a"]["rbs0"]["conv1"]
    assert "dw" not in params["g_a"]["rbs0"]["conv1"]


def test_old_synthesis_head():
    cfg = ModelConfig("TINY_OLD", N=32, M=64, slice_num=2, old_synthesis=True)
    model, params, out = _init_and_forward(cfg)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    # first synthesis block maps M->N (old head): its pointwise out = N
    rb0 = params["g_s"]["rb0"]["conv1"]
    k = rb0["dw"]["point"]["kernel"]
    assert k.shape[-1] == cfg.N


def test_param_counts_scale_with_config():
    small = ModelConfig("A", N=32, M=64, slice_num=2)
    big = ModelConfig("B", N=64, M=128, slice_num=4)
    n = {}
    for cfg in (small, big):
        model = MLICPlusPlus(cfg=cfg)
        x = jnp.zeros((1, 64, 64, 3))
        params = jax.jit(lambda r, v: model.init(r, v, True))(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x)["params"]
        n[cfg.name] = sum(p.size for p in jax.tree.leaves(params))
    assert n["B"] > 2 * n["A"]
