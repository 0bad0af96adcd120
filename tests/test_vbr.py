"""VBR model tests: multi-rate forward, Frank-Wolfe solver, codec round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlic_tpu.codec import Codec
from mlic_tpu.loss import rate_distortion_loss
from mlic_tpu.models.config import ModelConfig
from mlic_tpu.models.vbr import MLICPlusPlusVbr
from mlic_tpu.train.vbr import frank_wolfe_minnorm


TINY_VBR = ModelConfig("TINY_VBR", N=32, M=64, slice_num=2, vbr=True,
                       lmbda=(0.0018, 0.013, 0.0483),
                       gain_init=(0.1, 0.4, 1.0))


@pytest.fixture(scope="module")
def vbr():
    model = MLICPlusPlusVbr(cfg=TINY_VBR)
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    return model, params, x


def test_stage2_forward_levels_share_graph(vbr):
    model, params, x = vbr
    f = jax.jit(lambda p, v, s: model.apply({"params": p}, v, False, 2, s))
    bpps = []
    for s in range(3):
        out = f(params, x, jnp.asarray(s))
        rd = rate_distortion_loss(out, x, 0.013)
        bpps.append(float(rd["bpp_loss"]))
    assert all(np.isfinite(bpps))
    # larger gain (finer quantization) must not decrease rate
    assert bpps[0] <= bpps[1] + 0.1 and bpps[1] <= bpps[2] + 0.1
    # traced level => single compilation
    assert f._cache_size() == 1


def test_stage1_matches_base_forward_structure(vbr):
    model, params, x = vbr
    out = jax.jit(lambda p, v: model.apply({"params": p}, v, False, 1, 0))(params, x)
    assert out["x_hat"].shape == x.shape


def test_quant_offset_forward(vbr):
    """QuantABCD dead-zone path runs and produces finite, different output
    from the plain-STE path."""
    model, params, x = vbr
    f = jax.jit(lambda p, v, qo: model.apply({"params": p}, v, False, 2, 1, None, qo),
                static_argnums=2)
    out_plain = f(params, x, False)
    out_qo = f(params, x, True)
    assert np.isfinite(np.asarray(out_qo["x_hat"])).all()
    # offsets shift reconstructions away from the plain grid
    assert not np.allclose(np.asarray(out_qo["x_hat"]),
                           np.asarray(out_plain["x_hat"]))


def test_eb_vbr_variable_step():
    from mlic_tpu.entropy.models import EntropyBottleneckVbr
    module = EntropyBottleneckVbr(channels=8)
    z = jax.random.normal(jax.random.key(0), (1, 4, 4, 8)) * 5
    params = jax.jit(lambda r, v: module.init(r, v, True))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, z)["params"]
    out = {}
    for qs in (0.5, 1.0, 2.0):
        _, lk = module.apply({"params": params}, z, False, qs)
        out[qs] = float(jnp.sum(jnp.log2(lk)))
    # coarser steps -> fewer bits
    assert out[2.0] > out[1.0] > out[0.5]


def test_frank_wolfe_minnorm():
    # Two opposing gradients: min-norm combo is the (near-)zero point.
    g = jnp.asarray([[1.0, 0.0], [-1.0, 0.0]])
    gram = g @ g.T
    alpha = frank_wolfe_minnorm(gram)
    np.testing.assert_allclose(np.asarray(alpha), [0.5, 0.5], atol=1e-3)
    # A dominated gradient gets weight ~0 when another is strictly smaller
    g = jnp.asarray([[2.0, 0.0], [0.1, 0.0]])
    gram = g @ g.T
    alpha = frank_wolfe_minnorm(gram)
    assert float(alpha[1]) > 0.95
    # simplex constraints hold
    assert abs(float(alpha.sum()) - 1.0) < 1e-5 and float(alpha.min()) >= 0


def test_vbr_codec_roundtrip_two_levels(vbr):
    model, params, x = vbr
    codec = Codec(model, params)
    codec.update()
    sizes = []
    for s in (0, 2):
        enc = codec.compress(x, s=s)
        dec = codec.decompress(enc["strings"], enc["shape"], s=s)
        np.testing.assert_array_equal(np.asarray(enc["y_hat"]), np.asarray(dec["y_hat"]))
        np.testing.assert_array_equal(np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"]))
        sizes.append(len(enc["strings"][0][0]))
    assert sizes[0] <= sizes[1]  # coarser quantization -> fewer bytes
