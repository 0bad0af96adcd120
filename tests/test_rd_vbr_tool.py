"""Smoke test for tools/rd_vbr.py — the VBR RD sweep CLI.

Proves the whole tool path (checkpoint restore -> Codec.update -> per-level
real-bitstream eval -> inputscale interpolation -> JSON) runs end-to-end on
a tiny model, so the real TPU sweep (VERDICT r2 item 3) can't fail on tool
bugs.  Random-init weights: monotonicity is reported, not asserted.
"""

import json
import os

import jax
import pytest


def test_rd_vbr_cli_end_to_end(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")
    from mlic_tpu.models.registry import get_model

    model = get_model("MLICPP_TINY_VBR")
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    params = jax.jit(lambda r, v: model.init(r, v, True, 2, 1))(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x)["params"]
    ckpt = tmp_path / "ckpt"
    saver = ocp.StandardCheckpointer()
    saver.save(os.fspath(ckpt), {"params": params})
    saver.wait_until_finished()  # StandardCheckpointer saves asynchronously

    out = tmp_path / "rd_vbr.json"
    from tools import rd_vbr
    rd_vbr.main(["--model", "MLICPP_TINY_VBR",
                 "--ckpt", os.fspath(ckpt),
                 "--out", os.fspath(out),
                 "--n-images", "1", "--image-size", "128",
                 "--interp", "1",
                 "--save-dir", os.fspath(tmp_path / "eval")])

    curve = json.loads(out.read_text())  # strict JSON (no NaN literals)
    # 3 gain levels + 1 inputscale midpoint, sorted by gain
    assert len(curve["bpp"]) == 4
    assert curve["kind"].count("level") == 3
    assert curve["kind"].count("inputscale") == 1
    assert curve["gain"] == sorted(curve["gain"])
    assert all(b > 0 for b in curve["bpp"])
    # 128px < 176 -> ms_ssim must serialize as null, not NaN
    assert all(v is None for v in curve["ms_ssim"])
    assert isinstance(curve["monotone_rate"], bool)
