"""VBR model tests: multi-rate forward, Frank-Wolfe solver, codec round-trip."""

import dataclasses

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


def test_vbr_device_backend_roundtrip(vbr):
    """VBR through the DEVICE backend (on-device rANS, format-v3 streams):
    the traced gain level must produce bit-exact round trips at multiple
    levels from one compiled program pair."""
    model, params, x = vbr
    codec = Codec(model, params, backend="device", n_lanes=16)
    codec.update()
    ref = Codec(model, params)  # steps backend, single-stream oracle
    ref.update()
    for s in (0, 2):
        enc = codec.compress(x, s=s)
        dec = codec.decompress(enc["strings"], enc["shape"], s=s)
        np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                      np.asarray(dec["y_hat"]))
        np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                      np.asarray(dec["x_hat"]))
        # same quantized latent as the steps backend
        ref_enc = ref.compress(x, s=s)
        np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                      np.asarray(ref_enc["y_hat"]))


TINY_VBR_QO = dataclasses.replace(TINY_VBR, name="TINY_VBR_QO",
                                  quant_offset=True)
TINY_VBR_VRZ = dataclasses.replace(TINY_VBR, name="TINY_VBR_VRZ",
                                   vr_entbttlnck=True)
TINY_SD_VBR = dataclasses.replace(TINY_VBR, name="TINY_SD_VBR",
                                  small_decoder=True)


def _init_vbr(cfg, shape=(1, 64, 64, 3)):
    model = MLICPlusPlusVbr(cfg=cfg)
    x = jax.random.uniform(jax.random.key(0), shape)
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    return model, params, x


def test_quant_offset_codec_roundtrip():
    """QuantABCD offsets wired into the REAL coding path: symbols stay plain
    rounds, reconstructions carry the dead-zone offset, and encode/decode
    agree bit-exactly (VERDICT missing #4 / reference ckbd.py:146-193)."""
    model, params, x = _init_vbr(TINY_VBR_QO)
    codec = Codec(model, params)
    codec.update()
    enc = codec.compress(x, s=1)
    dec = codec.decompress(enc["strings"], enc["shape"], s=1)
    np.testing.assert_array_equal(np.asarray(enc["y_hat"]), np.asarray(dec["y_hat"]))
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"]))
    # The coding-path reconstruction matches the quant_offset forward
    # structure: it must differ from a no-offset codec's reconstruction.
    model_p, _, _ = _init_vbr(TINY_VBR)
    codec_p = Codec(model_p, params)
    codec_p.update()
    enc_p = codec_p.compress(x, s=1)
    assert not np.allclose(np.asarray(enc["x_hat"]), np.asarray(enc_p["x_hat"]))


def test_vr_entbttlnck_codec_roundtrip_two_steps():
    """EntropyBottleneckVbr wired into model + codec: variable z step from
    gayn2zqstep, per-step CDF tables, bit-exact round trip at 2 levels
    (VERDICT missing #3 / reference mlicpp_vbr.py:104-117,1168-1183)."""
    model, params, x = _init_vbr(TINY_VBR_VRZ)
    assert "zqstep_0" in params, "gayn2zqstep params must exist"
    codec = Codec(model, params)
    codec.update()
    z_sizes = {}
    for s in (0, 2):
        qs = codec._z_qs_for(s, 0.0)
        assert qs >= 0.5  # LowerBound(0.5)
        enc = codec.compress(x, s=s)
        dec = codec.decompress(enc["strings"], enc["shape"], s=s)
        np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                      np.asarray(dec["y_hat"]))
        np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                      np.asarray(dec["x_hat"]))
        z_sizes[s] = len(enc["strings"][1][0])
    # distinct steps were cached per level
    assert len(codec._zqs_cache) == 2


def test_vr_entbttlnck_forward_finite():
    model, params, x = _init_vbr(TINY_VBR_VRZ)
    f = jax.jit(lambda p, v, s: model.apply({"params": p}, v, False, 2, s))
    for s in (0, 1, 2):
        out = f(params, x, jnp.asarray(s))
        assert np.isfinite(np.asarray(out["x_hat"])).all()
        assert np.isfinite(np.asarray(out["likelihoods"]["z"])).all()


def test_train_gain_flag_controls_gain_gradient():
    """Default (parity with the reference's detached Gain,
    mlicpp_vbr.py:126-132): zero Gain gradient.  With train_gain=True the
    gather is differentiable and the selected level's gain moves."""
    for train_gain in (False, True):
        cfg = dataclasses.replace(TINY_VBR, name="TINY_VBR_TG",
                                  train_gain=train_gain)
        model, params, x = _init_vbr(cfg)

        def loss(p):
            out = model.apply({"params": p}, x, True, 2, 1,
                              rngs={"noise": jax.random.key(3)})
            return rate_distortion_loss(out, x, 0.013)["loss"]

        g = jax.jit(jax.grad(loss))(params)["Gain"]
        g = np.asarray(g)
        if train_gain:
            assert abs(g[1]) > 0, "selected level's gain must receive grad"
            assert g[0] == 0 and g[2] == 0, "unselected levels stay zero"
        else:
            np.testing.assert_array_equal(g, np.zeros_like(g))


def test_sd_vbr_forward_and_roundtrip():
    """Small-decoder + VBR combined config (MLICPP_M_SMALL_DEC_VBR shape,
    tiny dims): forward at 2 levels + bit-exact codec round trip
    (VERDICT weak #8)."""
    model, params, x = _init_vbr(TINY_SD_VBR)
    f = jax.jit(lambda p, v, s: model.apply({"params": p}, v, False, 2, s))
    for s in (0, 2):
        out = f(params, x, jnp.asarray(s))
        assert out["x_hat"].shape == x.shape
    codec = Codec(model, params)
    codec.update()
    enc = codec.compress(x, s=1)
    dec = codec.decompress(enc["strings"], enc["shape"], s=1)
    np.testing.assert_array_equal(np.asarray(enc["y_hat"]), np.asarray(dec["y_hat"]))
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"]))


def test_vbr_train_step_gradnorm_loss():
    """MGDA-UB per-level normalization (--vbr-gradnorm loss): one step runs,
    alpha stays on the simplex, params move, and with train_gain=True the
    Gain vector receives a (summed per-level) update."""
    from mlic_tpu.train.optimizers import make_optimizer
    from mlic_tpu.train.trainer import TrainConfig, TrainState
    from mlic_tpu.train.vbr import make_vbr_train_step

    cfg_m = dataclasses.replace(TINY_VBR, train_gain=True)
    model = MLICPlusPlusVbr(cfg=cfg_m)
    x = jax.random.uniform(jax.random.key(3), (2, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(4), "noise": jax.random.key(5)}, x)["params"]
    cfg = TrainConfig(lmbda=0.013)
    tx = make_optimizer(cfg.learning_rate, cfg.aux_learning_rate,
                        cfg.clip_max_norm, cfg.optimizer)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=jax.jit(tx.init)(params),
                       rng=jax.random.key(6))
    step = make_vbr_train_step(model, tx, cfg, gradnorm="loss")
    new_state, metrics = step(state, x)
    alpha = np.asarray(metrics["alpha"])
    assert np.all(alpha >= -1e-6) and abs(alpha.sum() - 1.0) < 1e-4
    assert np.isfinite(float(metrics["loss"]))
    # params moved
    l0 = jax.tree_util.tree_leaves(params)[0]
    l1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
