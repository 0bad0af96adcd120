"""Serving CLI smoke: pipelined compress+verify, containers decodable."""

import json
import os

import numpy as np


def test_serve_cli_verify_and_containers(tmp_path, capsys):
    from tools.serve import main
    out_dir = str(tmp_path / "streams")
    main(["--cpu", "--model", "MLICPP_TINY", "--synthetic", "--n", "4",
          "--batch", "2", "--size", "128", "192", "--lanes", "16",
          "--verify", "--out", out_dir])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert res["images"] == 4 and res["verify"]
    assert 0 < res["bpp"] < 16
    bins = sorted(os.listdir(out_dir))
    assert len(bins) == 4

    # containers decode through the standalone eval path
    import jax
    import jax.numpy as jnp

    from mlic_tpu.codec import Codec
    from mlic_tpu.eval import decompress_one_image
    from mlic_tpu.models.registry import get_model
    model = get_model("MLICPP_TINY")
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((2, 128, 192, 3)))["params"]
    codec = Codec(model, params, backend="device", n_lanes=16)
    codec.update()
    out = decompress_one_image(codec, os.path.join(out_dir, bins[0]))
    assert out["x_hat"].shape == (1, 128, 192, 3)
    assert np.isfinite(out["x_hat"]).all()
