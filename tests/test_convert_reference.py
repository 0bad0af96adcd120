"""Converter vs the REAL reference model classes (VERDICT round-1 item #3).

Uses tests/ref_shim.py (a faithful compressai shim) to instantiate the
actual torch model classes from /root/reference/MLIC++ and:

1. asserts ``convert()`` consumes the full state_dict of every variant with
   zero leftovers and lands every tensor on an existing flax leaf with the
   right shape (a misread reference key name now fails loudly);
2. runs the reference forward on tiny dims and compares the converted flax
   model's reconstruction — forward equivalence across frameworks.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo/tools")

import ref_shim  # noqa: E402
from convert_reference_checkpoint import build_mapping, convert  # noqa: E402

from mlic_tpu.models.config import model_config  # noqa: E402


VARIANTS = [
    ("MLICPP_S", {}),
    ("MLICPP_S_VBR", dict(vbr=True)),
    ("MLICPP_M_SMALL_DEC", dict(small_decoder=True)),
    ("MLICPP_M_SMALL_DEC_VBR", dict(vbr=True, small_decoder=True)),
]


@pytest.mark.parametrize("name,kw", VARIANTS)
def test_full_key_inventory_consumed(name, kw):
    model, _ = ref_shim.load_reference_model(name, **kw)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = model_config(name)
    params, matched, leftovers = convert(sd, cfg)
    assert leftovers == [], f"unconsumed reference keys: {leftovers[:8]}"
    # Mapping rows may be legitimately absent only for (a) the alternate
    # compressai EB naming generation and (b) identity residual skips.
    allowed_missing = ("entropy_bottleneck.matrices",
                       "entropy_bottleneck.biases",
                       "entropy_bottleneck.factors",
                       ".skip.")
    missing = [t for t, _, _ in build_mapping(cfg) if t not in sd]
    bad = [t for t in missing if not any(s in t for s in allowed_missing)]
    assert bad == [], f"mapping rows matched nothing: {bad[:8]}"


@pytest.mark.parametrize("name,kw", VARIANTS[:2])
def test_converted_leaves_match_flax_shapes(name, kw):
    import jax
    import jax.numpy as jnp
    from mlic_tpu.models.registry import get_model

    model, _ = ref_shim.load_reference_model(name, **kw)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = model_config(name)
    converted, _, _ = convert(sd, cfg)

    fmodel = get_model(name)
    if cfg.vbr:
        init = jax.jit(lambda r, v: fmodel.init(r, v, True, 2, 1))
    else:
        init = jax.jit(lambda r, v: fmodel.init(r, v, True))
    ref = init({"params": jax.random.key(0), "noise": jax.random.key(1)},
               jnp.zeros((1, 64, 64, 3)))["params"]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    flat_new = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    unknown = set(flat_new) - set(flat_ref)
    assert not unknown, f"converted leaves with no flax home: {sorted(map(str, unknown))[:6]}"
    for path, leaf in flat_new.items():
        assert flat_ref[path].shape == leaf.shape, (
            path, flat_ref[path].shape, leaf.shape)
    # every flax leaf is covered (no silently fresh weights)
    uncovered = set(flat_ref) - set(flat_new)
    assert not uncovered, f"flax leaves not fed by the reference: {sorted(map(str, uncovered))[:6]}"


def _tiny(name, **kw):
    return ref_shim.load_reference_model(
        name, tiny_overrides=dict(N=32, M=64, slice_num=2), **kw)


def test_forward_equivalence_tiny():
    """Reference torch forward (eval) == converted flax forward on the same
    input.  Validates every converted tensor semantically, not just by name."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from mlic_tpu.models.mlicpp import MLICPlusPlus

    model, _ = _tiny("MLICPP_S")
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = dataclasses.replace(model_config("MLICPP_TINY"), name="tiny_ref")
    converted, _, leftovers = convert(sd, cfg)
    assert leftovers == []

    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        out_t = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    xh_t = np.transpose(out_t["x_hat"].numpy(), (0, 2, 3, 1))

    fmodel = MLICPlusPlus(cfg=cfg)
    out_f = jax.jit(lambda p, v: fmodel.apply({"params": p}, v, False))(
        converted, jnp.asarray(x))
    xh_f = np.asarray(out_f["x_hat"])
    assert xh_f.shape == xh_t.shape
    # Rounding boundaries can flip a latent between frameworks at ~1e-6
    # conv-impl noise; demand near-exactness for the bulk and sanity for all.
    diff = np.abs(xh_f - xh_t)
    assert np.quantile(diff, 0.999) < 2e-3, float(np.quantile(diff, 0.999))
    assert diff.mean() < 2e-4, float(diff.mean())


def test_forward_equivalence_tiny_vbr():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from mlic_tpu.models.vbr import MLICPlusPlusVbr

    model, _ = _tiny("MLICPP_S_VBR", vbr=True)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = dataclasses.replace(
        model_config("MLICPP_S_VBR"), N=32, M=64, slice_num=2, name="tiny_vbr")
    converted, _, leftovers = convert(sd, cfg)
    assert leftovers == []

    rng = np.random.default_rng(1)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    s = 2
    with torch.no_grad():
        out_t = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                      stage=2, s=s)
    xh_t = np.transpose(out_t["x_hat"].numpy(), (0, 2, 3, 1))

    fmodel = MLICPlusPlusVbr(cfg=cfg)
    out_f = jax.jit(lambda p, v: fmodel.apply({"params": p}, v, False, 2, s))(
        converted, jnp.asarray(x))
    xh_f = np.asarray(out_f["x_hat"])
    diff = np.abs(xh_f - xh_t)
    assert np.quantile(diff, 0.999) < 2e-3, float(np.quantile(diff, 0.999))
    assert diff.mean() < 2e-4, float(diff.mean())
