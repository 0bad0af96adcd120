"""Convert a reference (PyTorch MLIC++) checkpoint into mlic_tpu flax params.

Lets users of the reference bring trained weights across.  The key mapping
is derived from the reference module definitions
(``MLIC++/models/mlicpp.py``, ``modules/transform/*``, ``modules/layers/*``)
and the compressai parameter layout; tensor layouts are re-expressed for
NHWC flax:

  Conv2d  OIHW -> HWIO          Linear  [O,I] -> [I,O]
  depthwise Conv2d [C,1,kh,kw] -> [kh,kw,1,C]
  GDN gamma [O,I] -> [I,O] (same sqrt reparameterization both sides)
  LocalContext fusion Conv2d(C,2C,k=w) -> Dense[(w*w*C), 2C] with
    kernel[(i*w+j)*C + c, o] = torch[o, c, i, j]

Entropy-model CDF buffers are NOT converted — this framework rebuilds them
from the learned quantiles/densities at ``Codec.update()``.

Usage:
  python tools/convert_reference_checkpoint.py --torch-ckpt path.pth.tar \
      --model MLICPP_L --dense --out ckpt_dir

Self-test (no torch file needed):
  python tools/convert_reference_checkpoint.py --self-test
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Tensor layout converters (torch array -> flax array), with inverses for the
# self-test.
# ---------------------------------------------------------------------------
def conv_t2f(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def conv_f2t(w):
    return np.transpose(w, (3, 2, 0, 1))


def linear_t2f(w):  # [O,I] -> [I,O]
    return np.transpose(w)


def fusion_t2f(w):  # [O, C, kh, kw] -> [(kh*kw*C), O]
    o, c, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * c, o)


def fusion_f2t(w, c, k=5):
    n, o = w.shape
    return np.transpose(w.reshape(k, k, c, o), (3, 2, 0, 1))


IDENT = (lambda a: np.asarray(a), lambda a: np.asarray(a))
CONV = (conv_t2f, conv_f2t)
LINEAR = (linear_t2f, linear_t2f)


def _conv_entry(torch_prefix, flax_path, depthwise):
    """Mapping rows for our Conv3x3 factory output."""
    rows = []
    if depthwise:
        rows.append((f"{torch_prefix}.depth_conv.weight",
                     flax_path + ("dw", "depth", "kernel"), CONV))
        rows.append((f"{torch_prefix}.depth_conv.bias",
                     flax_path + ("dw", "depth", "bias"), IDENT))
        rows.append((f"{torch_prefix}.point_conv.weight",
                     flax_path + ("dw", "point", "kernel"), CONV))
        rows.append((f"{torch_prefix}.point_conv.bias",
                     flax_path + ("dw", "point", "bias"), IDENT))
    else:
        rows.append((f"{torch_prefix}.weight", flax_path + ("conv", "kernel"), CONV))
        rows.append((f"{torch_prefix}.bias", flax_path + ("conv", "bias"), IDENT))
    return rows


def _plain_conv(torch_prefix, flax_path):
    return [(f"{torch_prefix}.weight", flax_path + ("kernel",), CONV),
            (f"{torch_prefix}.bias", flax_path + ("bias",), IDENT)]


def _linear(torch_prefix, flax_path):
    return [(f"{torch_prefix}.weight", flax_path + ("kernel",), LINEAR),
            (f"{torch_prefix}.bias", flax_path + ("bias",), IDENT)]


def _layernorm(torch_prefix, flax_path):
    return [(f"{torch_prefix}.weight", flax_path + ("scale",), IDENT),
            (f"{torch_prefix}.bias", flax_path + ("bias",), IDENT)]


def _gdn(torch_prefix, flax_path):
    gamma = (lambda a: np.transpose(a), lambda a: np.transpose(a))
    return [(f"{torch_prefix}.beta", flax_path + ("beta",), IDENT),
            (f"{torch_prefix}.gamma", flax_path + ("gamma",), gamma)]


def _subpel(torch_prefix, flax_path):
    # compressai subpel_conv3x3 = Sequential(Conv2d, PixelShuffle): index 0
    return _plain_conv(f"{torch_prefix}.0", flax_path + ("conv",))


def _res_block(torch_prefix, flax_path, dw, with_stride=False, upsample=False):
    rows = []
    if upsample:
        rows += _subpel(f"{torch_prefix}.subpel_conv", flax_path + ("subpel",))
        rows += _conv_entry(f"{torch_prefix}.conv", flax_path + ("conv",), dw)
        rows += _gdn(f"{torch_prefix}.igdn", flax_path + ("igdn",))
        rows += _subpel(f"{torch_prefix}.upsample", flax_path + ("upsample",))
        return rows
    rows += _conv_entry(f"{torch_prefix}.conv1", flax_path + ("conv1",), dw)
    rows += _conv_entry(f"{torch_prefix}.conv2", flax_path + ("conv2",), dw)
    if with_stride:
        rows += _gdn(f"{torch_prefix}.gdn", flax_path + ("gdn",))
        rows += _plain_conv(f"{torch_prefix}.skip", flax_path + ("skip",))
    return rows


def build_mapping(cfg) -> list:
    """[(torch_key, flax_path tuple, (fwd, inv))] for a ModelConfig."""
    dw = cfg.depthwise
    enc_dw = dw and not cfg.small_decoder
    S, C = cfg.slice_num, cfg.slice_ch
    rows = []

    # g_a: Sequential indices 0..6 (analysis.py:6-22)
    ga = "g_a.analysis_transform"
    rows += _res_block(f"{ga}.0", ("g_a", "rbs0"), enc_dw, with_stride=True)
    rows += _res_block(f"{ga}.1", ("g_a", "rb0"), enc_dw)
    rows += _res_block(f"{ga}.2", ("g_a", "rbs1"), enc_dw, with_stride=True)
    rows += _res_block(f"{ga}.3", ("g_a", "rb1"), enc_dw)
    rows += _res_block(f"{ga}.4", ("g_a", "rbs2"), enc_dw, with_stride=True)
    rows += _res_block(f"{ga}.5", ("g_a", "rb2"), enc_dw)
    rows += _conv_entry(f"{ga}.6", ("g_a", "out"), enc_dw)

    # h_a: reduction indices 0,2,4,6,8 (analysis.py:25-48)
    for k, name in zip((0, 2, 4, 6, 8), ("c0", "c1", "c2", "c3", "c4")):
        rows += _conv_entry(f"h_a.reduction.{k}", ("h_a", name), enc_dw)

    # h_s: increase indices 0,2,4,6,8 = conv, subpel, conv, subpel, conv
    rows += _conv_entry("h_s.increase.0", ("h_s", "c0"), dw)
    rows += _subpel("h_s.increase.2", ("h_s", "up0"))
    rows += _conv_entry("h_s.increase.4", ("h_s", "c1"), dw)
    rows += _subpel("h_s.increase.6", ("h_s", "up1"))
    rows += _conv_entry("h_s.increase.8", ("h_s", "c2"), dw)

    # g_s: indices 0..7 (synthesis.py:56-73)
    gs = "g_s.synthesis_transform"
    rows += _res_block(f"{gs}.0", ("g_s", "rb0"), dw)
    rows += _res_block(f"{gs}.1", ("g_s", "up0"), dw, upsample=True)
    rows += _res_block(f"{gs}.2", ("g_s", "rb1"), dw)
    rows += _res_block(f"{gs}.3", ("g_s", "up1"), dw, upsample=True)
    rows += _res_block(f"{gs}.4", ("g_s", "rb2"), dw)
    rows += _res_block(f"{gs}.5", ("g_s", "up2"), dw, upsample=True)
    rows += _res_block(f"{gs}.6", ("g_s", "rb3"), dw)
    rows += _subpel(f"{gs}.7", ("g_s", "out"))

    # M->N / skip convs appear when in_ch != out_ch in RB; the reference's
    # ResidualBlock adds `skip` only then — same rule as ours, so rows for
    # missing skips are simply absent on both sides (converter tolerates).
    rows += _plain_conv(f"{gs}.0.skip", ("g_s", "rb0", "skip"))
    rows += _plain_conv(f"{ga}.0.skip", ("g_a", "rbs0", "skip"))

    # Entropy bottleneck (compressai): handles both naming generations.
    for k in range(4 + 1):
        pairs = [(f"_matrix{k}", f"matrix_{k}"),
                 (f"matrices.{k}", f"matrix_{k}"),
                 (f"_bias{k}", f"bias_{k}"),
                 (f"biases.{k}", f"bias_{k}")]
        if k < 4:  # factors exist between layers only
            pairs += [(f"_factor{k}", f"factor_{k}"),
                      (f"factors.{k}", f"factor_{k}")]
        for t_name, f_name in pairs:
            rows.append((f"entropy_bottleneck.{t_name}",
                         ("entropy_bottleneck", f_name), IDENT))
    rows.append(("entropy_bottleneck.quantiles",
                 ("entropy_bottleneck", "quantiles"), IDENT))

    # Per-slice context modules
    for i in range(S):
        lc = f"local_context.{i}"
        fl = (f"local_{i}",)
        rows += _linear(f"{lc}.qkv_proj", fl + ("qkv",))
        rows.append((f"{lc}.relative_position_table", fl + ("rel_pos_table",), IDENT))
        rows += _layernorm(f"{lc}.norm1", fl + ("norm1",))
        rows += _layernorm(f"{lc}.norm2", fl + ("norm2",))
        rows += _linear(f"{lc}.proj", fl + ("proj",))
        rows += _linear(f"{lc}.mlp.fc1", fl + ("mlp", "fc1"))
        rows += _linear(f"{lc}.mlp.fc2", fl + ("mlp", "fc2"))
        fusion = ((lambda a: fusion_t2f(a)),
                  (lambda a, c=C: fusion_f2t(a, c)))
        rows.append((f"{lc}.fusion.weight", fl + ("fusion", "kernel"), fusion))
        rows.append((f"{lc}.fusion.bias", fl + ("fusion", "bias"), IDENT))

        for branch, fbr in (("lrp_anchor", f"lrp_anchor_{i}"),
                            ("lrp_nonanchor", f"lrp_nonanchor_{i}")):
            n_convs = 4 if cfg.small_decoder else 3
            for k in range(n_convs):
                rows += _conv_entry(f"{branch}.{i}.lrp_transform.{2 * k}",
                                    (fbr, f"c{k}"), dw)
        for branch, fbr in (("entropy_parameters_anchor", f"ep_anchor_{i}"),
                            ("entropy_parameters_nonanchor", f"ep_nonanchor_{i}")):
            for k in range(4):
                rows += _plain_conv(f"{branch}.{i}.fusion.{2 * k}", (fbr, f"c{k}"))

        if i == 0:
            continue
        ch_dw = dw and not cfg.small_decoder
        for k in range(3):  # note reference's "fushion" spelling
            rows += _conv_entry(f"channel_context.{i}.fushion.{2 * k}",
                                (f"chctx_{i}", f"c{k}"), ch_dw)
        for mod, fmod, n_mlp, has_skip in (
                ("global_inter_context", f"ginter_{i}", 3, True),
                ("global_intra_context", f"gintra_{i}", 3, False)):
            for qkv in ("queries", "keys", "values"):
                rows += _plain_conv(f"{mod}.{i}.{qkv}.0", (fmod, qkv, "pw"))
                rows += _plain_conv(f"{mod}.{i}.{qkv}.1", (fmod, qkv, "dw"))
            rows += _plain_conv(f"{mod}.{i}.reprojection", (fmod, "reprojection"))
            for k in range(n_mlp):
                rows += _plain_conv(f"{mod}.{i}.mlp.{2 * k}", (fmod, f"mlp{k}"))
            if has_skip:
                rows += _plain_conv(f"{mod}.{i}.skip", (fmod, "skip"))

    if cfg.vbr:
        rows.append(("Gain", ("Gain",), IDENT))
        for k in range(3):
            rows += _linear(f"QuantABCD.{2 * k}", (f"qabcd_{k}",))
        if getattr(cfg, "vr_entbttlnck", False):
            # gayn2zqstep Linear(1,10)-ReLU-Linear(10,10)-ReLU-Linear(10,1)
            # -Softplus (reference mlicpp_vbr.py:104-117)
            for k in range(3):
                rows += _linear(f"gayn2zqstep.{2 * k}", (f"zqstep_{k}",))
    return rows


# ---------------------------------------------------------------------------
def _get_path(tree, path):
    for p in path:
        if p not in tree:
            return None
        tree = tree[p]
    return tree


def _set_path(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def convert(state_dict: dict, cfg, strict: bool = False) -> tuple[dict, list, list]:
    """torch state_dict (numpy values) -> (flax params, matched, missing)."""
    state_dict = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params: dict = {}
    matched, missing = [], []
    for t_key, f_path, (fwd, _inv) in build_mapping(cfg):
        if t_key in state_dict:
            _set_path(params, f_path, np.asarray(fwd(np.asarray(state_dict[t_key]))))
            matched.append(t_key)
        else:
            missing.append(t_key)
    # Keys that are rebuilt (CDF tables) or constants (lower-bound/reparam
    # buffers) rather than converted.
    _SKIP = ("gaussian_conditional", "_cdf", "_offset", "scale_table",
             "target", "_quantized", "pedestal", ".bound", "QuantOffset",
             "relative_position_index")  # Swin index buffer: iota-derived
    matched_set = set(matched)
    leftovers = [k for k in state_dict
                 if k not in matched_set
                 and not any(s in k for s in _SKIP)]
    if strict and leftovers:
        raise KeyError(f"unconverted reference keys: {leftovers[:10]} ...")
    return params, matched, leftovers


def invert(params: dict, cfg) -> dict:
    """flax params -> reference-style state_dict (self-test oracle)."""
    out = {}
    for t_key, f_path, (_fwd, inv) in build_mapping(cfg):
        leaf = _get_path(params, f_path)
        if leaf is not None and not t_key.startswith(
                ("entropy_bottleneck.matrices", "entropy_bottleneck.biases",
                 "entropy_bottleneck.factors")):
            out[t_key] = np.asarray(inv(np.asarray(leaf)))
    return out


def self_test(cfg=None):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mlic_tpu.models.config import model_config
    from mlic_tpu.models.mlicpp import MLICPlusPlus

    if cfg is None:
        cfg = model_config("MLICPP_TINY")
    if cfg.vbr:
        from mlic_tpu.models.vbr import MLICPlusPlusVbr
        model = MLICPlusPlusVbr(cfg=cfg)
        init = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))
    else:
        model = MLICPlusPlus(cfg=cfg)
        init = jax.jit(lambda r, v: model.init(r, v, True))
    ref = init({"params": jax.random.key(0), "noise": jax.random.key(1)},
               jnp.zeros((1, 64, 64, 3)))["params"]
    ref = jax.tree.map(np.asarray, jax.device_get(ref))

    fake_torch = invert(ref, cfg)
    converted, matched, leftovers = convert(fake_torch, cfg)

    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    flat_new = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    n_checked = 0
    for path, leaf in flat_new.items():
        want = flat_ref[path]
        assert want.shape == leaf.shape, (path, want.shape, leaf.shape)
        np.testing.assert_array_equal(leaf, want, err_msg=str(path))
        n_checked += 1
    total = len(flat_ref)
    print(f"self-test OK: {n_checked}/{total} leaves round-trip exactly "
          f"({len(matched)} torch keys)")
    uncovered = [jax.tree_util.keystr(p) for p in
                 set(flat_ref) - set(flat_new)]
    if uncovered:
        print(f"note: {len(uncovered)} leaves have no reference counterpart "
              f"(created fresh on load): {sorted(uncovered)[:6]} ...")
    return n_checked, total


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", help="reference .pth/.pth.tar checkpoint")
    p.add_argument("--model", default="MLICPP_L")
    p.add_argument("--dense", action="store_true",
                   help="published MLIC++ weights use dense convs")
    p.add_argument("--out", help="output orbax checkpoint dir")
    p.add_argument("--self-test", action="store_true")
    args = p.parse_args(argv)

    if args.self_test:
        self_test()
        return

    import dataclasses
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp
    from mlic_tpu.models.config import model_config

    cfg = model_config(args.model)
    if args.dense:
        cfg = dataclasses.replace(cfg, depthwise=False)
    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, matched, leftovers = convert(sd, cfg)
    print(f"converted {len(matched)} tensors; unmapped reference keys: "
          f"{len(leftovers)}")
    if leftovers:
        print("  e.g.", leftovers[:8])
    saver = ocp.StandardCheckpointer()
    saver.save(os.path.abspath(args.out), {"params": params})
    saver.wait_until_finished()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
