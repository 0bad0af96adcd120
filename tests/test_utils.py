"""Tests for misc utils, bitstream container, logger, BD metrics."""

import io
import json
import os
import sys

import numpy as np

from mlic_tpu.utils import bitstream
from mlic_tpu.utils.misc import (
    AverageMeter,
    Config,
    image_to_patches,
    patches_to_image,
    pretty_print_dict,
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
import bdrate  # noqa: E402


def test_bitstream_body_roundtrip():
    buf = io.BytesIO()
    strings = [[b"hello"], [b"world!!"]]
    bitstream.write_body(buf, (8, 12), strings)
    buf.seek(0)
    got, shape = bitstream.read_body(buf)
    assert shape == (8, 12)
    assert got == strings


def test_bitstream_uints_roundtrip():
    buf = io.BytesIO()
    bitstream.write_uints(buf, (512, 768, 3))
    buf.seek(0)
    assert bitstream.read_uints(buf, 3) == (512, 768, 3)


def test_config_attrdict(tmp_path):
    c = Config({"N": 192, "M": 320})
    assert c.N == 192
    c.slice_num = 10
    assert c["slice_num"] == 10
    p = tmp_path / "cfg.json"
    c.to_json(str(p))
    c2 = Config.from_json(str(p))
    assert c2.M == 320


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0, n=3)
    assert m.avg == 2.5
    assert m.val == 3.0


def test_patches_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 48, 3)).astype(np.float32)
    p = image_to_patches(x, 16)
    assert p.shape == (2 * 2 * 3, 16, 16, 3)
    back = patches_to_image(p, (2, 3))
    np.testing.assert_array_equal(back, x)


def test_pretty_print_dict():
    s = pretty_print_dict({"psnr": 35.93312, "bpp": 0.5998})
    assert "psnr" in s and "35.9331" in s


def test_bd_rate_identity_and_shift():
    bpp = np.array([0.1, 0.2, 0.4, 0.8])
    psnr = np.array([30.0, 32.0, 34.0, 36.0])
    assert abs(bdrate.bd_rate(bpp, psnr, bpp, psnr)) < 1e-9
    # test curve needing exactly 10% more rate at equal quality
    r = bdrate.bd_rate(bpp, psnr, bpp * 1.1, psnr)
    assert abs(r - 10.0) < 0.2
    # and a 1 dB better curve at equal rate
    d = bdrate.bd_psnr(bpp, psnr, bpp, psnr + 1.0)
    assert abs(d - 1.0) < 1e-6


def test_dl_bucket_fine_granularity():
    """Download buckets: <=~10% waste, monotone, minimum respected."""
    from mlic_tpu.codec import _bucket, _dl_bucket

    prev = 0
    for n in [1, 5000, 70000, 123456, 300000, 1 << 20, (1 << 20) + 1]:
        b = _dl_bucket(n)
        assert b >= n
        assert b >= _dl_bucket(1)  # minimum
        if n > 8192:
            assert b <= int(n * 1.13), (n, b)  # fine buckets: small waste
        assert _dl_bucket(n) == b  # deterministic
        assert b >= prev or n < prev  # monotone in n
        prev = b
    # coarse pow2 buckets for device-program shapes stay pow2
    for n in [100, 70000, 300000]:
        b = _bucket(n)
        assert b & (b - 1) == 0 and b >= n
