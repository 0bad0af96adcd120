"""Decoder FLOPs/MACs accounting via XLA cost analysis.

Equivalent of the reference's deepspeed-profiler ``get_macs``
(``MLIC++/utils/testing.py:311-331``): profiles the decoder-only proxy
``net_decoder_forward`` at 1920x1088 and reports GMACs (= GFLOPs / 2) to
compare against the README table (``README.md:21-31``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decoder_cost(model_name: str, h: int = 1088, w: int = 1920,
                 cpu: bool = True, depthwise: bool | None = None) -> dict:
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mlic_tpu.models.mlicpp import MLICPlusPlus
    from mlic_tpu.models.registry import get_model

    model = get_model(model_name)
    if depthwise is not None:
        import dataclasses
        model = type(model)(cfg=dataclasses.replace(model.cfg,
                                                    depthwise=depthwise))
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x)["params"]

    fn = jax.jit(lambda p, v: model.apply({"params": p}, v,
                                          method=MLICPlusPlus.net_decoder_forward))
    lowered = fn.lower(params, x)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    return {
        "model": model_name,
        "resolution": f"{w}x{h}",
        "gflops": flops / 1e9,
        "gmacs": flops / 2e9,
        "params_m": n_params / 1e6,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--dense", action="store_true",
                   help="normal convs (depthwise=False), the published "
                        "MLIC++ weights' variant")
    args = p.parse_args(argv)
    out = decoder_cost(args.model, args.height, args.width,
                       depthwise=False if args.dense else None)
    if args.dense:
        out["convs"] = "dense"
    print({k: round(v, 3) if isinstance(v, float) else v for k, v in out.items()})


if __name__ == "__main__":
    main()
