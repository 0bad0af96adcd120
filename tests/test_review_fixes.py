"""Regression tests for code-review findings."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.codec import Codec
from mlic_tpu.entropy.cdf import build_cdf_tables
from mlic_tpu.entropy.rans import coder
from mlic_tpu.models.config import ModelConfig
from mlic_tpu.models.vbr import MLICPlusPlusVbr
from mlic_tpu.utils import bitstream


def _tables():
    pmf = np.array([[0.3, 0.3, 0.3]])
    cdfs, lens = build_cdf_tables(pmf, np.array([3]), np.array([0.1]), 3)
    return cdfs, lens, np.array([-1], np.int32)


def test_interleaved_fewer_symbols_than_lanes():
    """Lanes beyond the symbol count must not read out of bounds (was a
    confirmed segfault)."""
    cdfs, lens, offs = _tables()
    sym = np.array([0, 1, -1], np.int32)
    idx = np.zeros(3, np.int32)
    for n_lanes in (4, 32, 256):
        stream = coder.encode_interleaved(sym, idx, n_lanes, cdfs, lens, offs)
        out = coder.decode_interleaved(stream, idx, cdfs, lens, offs)
        np.testing.assert_array_equal(out, sym)
    # zero symbols
    stream = coder.encode_interleaved(np.empty(0, np.int32), np.empty(0, np.int32),
                                      8, cdfs, lens, offs)
    assert len(stream) > 0


def test_write_body_refuses_batched_groups():
    buf = io.BytesIO()
    with pytest.raises(ValueError, match="per-image"):
        bitstream.write_body(buf, (4, 4), [[b"a", b"b"], [b"z"]])


def test_buffered_encoder_flush_without_tables():
    enc = coder.BufferedRansEncoder()
    enc.encode_with_indexes([1], [0])
    with pytest.raises(ValueError, match="CDF tables"):
        enc.flush()


def test_warmup_plus_milestones_decay_at_absolute_step():
    from mlic_tpu.train import optimizers as opt
    import optax
    warm = 10
    base = 1e-3
    after = opt.multistep_lr(base, [100 - warm])
    lr = optax.join_schedules(
        [optax.linear_schedule(0.0, base, warm), after], [warm])
    assert abs(float(lr(99)) - base) < 1e-9
    assert abs(float(lr(101)) - base * 0.1) < 1e-9


def test_vbr_inputscale_file_roundtrip(tmp_path):
    """Continuous-rate coding through the on-disk container must decode with
    the exact encoding gain (was: decoder silently used Gain[s])."""
    from mlic_tpu import eval as ev
    cfg = ModelConfig("T_VBR", N=32, M=64, slice_num=2, vbr=True,
                      lmbda=(0.0018, 0.0483), gain_init=(0.15, 1.0))
    model = MLICPlusPlusVbr(cfg=cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    codec = Codec(model, params)
    codec.update()
    path = str(tmp_path / "img.bin")
    enc = ev.compress_one_image(codec, np.asarray(x), path, s=0, inputscale=0.37)
    dec = ev.decompress_one_image(codec, path, vbr=True)
    np.testing.assert_array_equal(dec["x_hat"], enc["x_hat_enc"])


def test_slot_lut_cache_keys_by_content():
    cdfs_a, lens, offs = _tables()
    pmf = np.array([[0.05, 0.05, 0.8]])
    cdfs_b, lens_b = build_cdf_tables(pmf, np.array([3]), np.array([0.1]), 3)
    lut_a = coder._slot_lut(np.ascontiguousarray(cdfs_a), lens)
    lut_b = coder._slot_lut(np.ascontiguousarray(cdfs_b), lens_b)
    assert not np.array_equal(lut_a, lut_b)
    # same content from a different buffer hits the cache entry
    lut_a2 = coder._slot_lut(cdfs_a.copy(), lens.copy())
    np.testing.assert_array_equal(lut_a, lut_a2)


def test_simplecache_typeerror_not_swallowed(tmp_path):
    from mlic_tpu.analysis.cache import SimpleCache
    cache = SimpleCache(cache_dir=str(tmp_path))
    calls = {"n": 0}

    @cache.cached
    def buggy(x):
        calls["n"] += 1
        return "s" + 1  # genuine TypeError

    with pytest.raises(TypeError):
        buggy(1)
    assert calls["n"] == 1  # not silently retried

    @cache.cached
    def ok(x):
        calls["n"] += 1
        return x * 2

    assert ok(3) == 6
    assert ok(3) == 6  # memory hit
    assert calls["n"] == 2
