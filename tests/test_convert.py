"""Reference-checkpoint converter: inverse round-trip covers every leaf."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import convert_reference_checkpoint as crc  # noqa: E402


import pytest
from mlic_tpu.models.config import ModelConfig, model_config


@pytest.mark.parametrize("cfg", [
    model_config("MLICPP_TINY"),
    ModelConfig("T_DENSE", N=32, M=64, slice_num=2, depthwise=False),
    ModelConfig("T_SD", N=32, M=64, slice_num=2, small_decoder=True),
    ModelConfig("T_VBR", N=32, M=64, slice_num=2, vbr=True,
                lmbda=(0.0018, 0.0483), gain_init=(0.15, 1.0)),
], ids=["depthwise", "dense", "small_dec", "vbr"])
def test_converter_roundtrip_covers_all_leaves(cfg):
    checked, total = crc.self_test(cfg)
    assert checked == total, f"converter covers {checked}/{total} leaves"


def test_converter_tolerates_module_prefix_and_extra_keys():
    import numpy as np
    from mlic_tpu.models.config import model_config
    cfg = model_config("MLICPP_TINY")
    sd = {"module.g_a.analysis_transform.6.point_conv.bias": np.zeros(cfg.M),
          "gaussian_conditional._quantized_cdf": np.zeros((64, 10)),
          "some_unknown_thing": np.zeros(3)}
    params, matched, leftovers = crc.convert(sd, cfg)
    assert matched == ["g_a.analysis_transform.6.point_conv.bias"]
    assert leftovers == ["some_unknown_thing"]
