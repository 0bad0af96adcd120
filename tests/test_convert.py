"""Reference-checkpoint converter: inverse round-trip covers every leaf."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import convert_reference_checkpoint as crc  # noqa: E402


def test_converter_roundtrip_covers_all_leaves():
    checked, total = crc.self_test()
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
