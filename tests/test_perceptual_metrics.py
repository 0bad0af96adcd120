"""LPIPS/DISTS structure tests (reference ``MLIC++/utils/metrics.py:13-53``).

Pretrained weights are unavailable offline, so these validate structure,
determinism, and the weight-loading contract with synthetic torch files.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlic_tpu.perceptual_metrics import (DISTS, LPIPSVgg, _STAGES5,
                                         init_dists, init_lpips,
                                         load_dists_weights,
                                         load_lpips_weights)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    a = rng.random((1, 64, 64, 3), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape, dtype=np.float32), 0, 1)
    return jnp.asarray(a), jnp.asarray(b)


def test_lpips_zero_on_identical_and_positive_on_noise(imgs):
    a, b = imgs
    params = init_lpips()
    model = LPIPSVgg()
    f = jax.jit(lambda x, y: model.apply({"params": params}, x, y))
    d_same = np.asarray(f(a, a))
    d_diff = np.asarray(f(a, b))
    assert d_same.shape == (1,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    assert float(d_diff[0]) > float(d_same[0])
    # deterministic
    np.testing.assert_array_equal(np.asarray(f(a, b)), d_diff)


def test_dists_zero_on_identical_and_positive_on_noise(imgs):
    a, b = imgs
    params = init_dists()
    model = DISTS()
    f = jax.jit(lambda x, y: model.apply({"params": params}, x, y))
    d_same = np.asarray(f(a, a))
    d_diff = np.asarray(f(a, b))
    assert d_same.shape == (1,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-4)
    assert float(d_diff[0]) > 1e-4


def test_lpips_weight_loader(tmp_path):
    torch = pytest.importorskip("torch")
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    widths = [w for ws in _STAGES5 for w in ws]
    sd, in_ch = {}, 3
    for idx, w in zip(conv_idx, widths):
        sd[f"features.{idx}.weight"] = torch.randn(w, in_ch, 3, 3)
        sd[f"features.{idx}.bias"] = torch.randn(w)
        in_ch = w
    vggf = tmp_path / "vgg16.pth"
    torch.save(sd, vggf)
    lin = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
           for i, c in enumerate([64, 128, 256, 512, 512])}
    linf = tmp_path / "lpips_vgg.pth"
    torch.save(lin, linf)

    params = init_lpips()
    loaded = load_lpips_weights(params, str(vggf), str(linf))
    assert loaded["lin0"].shape == (64, 1)
    np.testing.assert_allclose(
        np.asarray(loaded["vgg"]["conv1_1"]["kernel"]),
        sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))
    # loaded weights actually change the metric
    model = LPIPSVgg()
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3), np.float32))
    y = jnp.zeros_like(x)
    d0 = model.apply({"params": params}, x, y)
    d1 = model.apply({"params": loaded}, x, y)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_dists_weight_loader(tmp_path):
    torch = pytest.importorskip("torch")
    n = 3 + sum(w[-1] for w in _STAGES5)
    sd = {"alpha": torch.rand(1, n, 1, 1), "beta": torch.rand(1, n, 1, 1)}
    f = tmp_path / "dists.pt"
    torch.save(sd, f)
    params = init_dists()
    loaded = load_dists_weights(params, str(f))
    assert loaded["alpha"].shape == (n,)
    np.testing.assert_allclose(np.asarray(loaded["beta"]),
                               sd["beta"].numpy().reshape(-1))
