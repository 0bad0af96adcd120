"""Standalone wall-time of each NN module at Kodak-size latent shapes.

The codec's two device passes (context NN) dominate the pipeline
(PARITY.md stage profile) at ~0.5-1% MXU utilization; this tool times each
module class in isolation — with the per-slice instance counts the real
pass uses — so kernel work (Pallas fusion, phase batching) targets the
actual hogs rather than the presumed ones.  Random weights: execution time
is shape-, not value-, dependent.

Usage: python tools/profile_modules.py   (env: PM_MODEL, PM_BATCH, PM_REPS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mlic_tpu.models.config import model_config
    from mlic_tpu.models.context import (
        ChannelContext,
        EntropyParameters,
        LatentResidualPrediction,
        LinearGlobalInterContext,
        LinearGlobalIntraContext,
        LocalContext,
    )
    from mlic_tpu.models.transforms import (
        AnalysisTransform,
        HyperAnalysis,
        HyperSynthesis,
        SynthesisTransform,
    )

    name = os.environ.get("PM_MODEL", "MLICPP_S")
    B = int(os.environ.get("PM_BATCH", "8"))
    reps = int(os.environ.get("PM_REPS", "10"))
    cfg = model_config(name)
    N, M, S, C = cfg.N, cfg.M, cfg.slice_num, cfg.slice_ch
    H, W = 512, 768
    h, w = H // 16, W // 16

    key = jax.random.key(0)

    def bench(label, module, args, count=1):
        params = module.init(key, *args)

        def first(o):
            return o[0] if isinstance(o, (tuple, list)) else o

        fn = jax.jit(lambda p, *a: module.apply(p, *a))
        # warmup WITH materialization (the axon runtime defers execution of
        # never-fetched outputs — block_until_ready alone measures nothing)
        float(jnp.sum(first(fn(params, *args))))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(reps):
            out = fn(params, *args)
            acc = acc + jnp.sum(first(out)).astype(jnp.float32)
        float(acc)  # one fence for the whole chain
        ms = (time.perf_counter() - t0) / reps * 1000
        rows.append({"module": label, "ms_per_call": round(ms, 3),
                     "calls_per_pass": count,
                     "ms_per_pass": round(ms * count, 3)})
        print(f"{label:32s} {ms:8.2f} ms x{count} = {ms*count:8.2f} ms",
              flush=True)

    rows = []
    x_img = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    y_lat = jax.random.normal(key, (B, h, w, M), jnp.float32)
    z_lat = jax.random.normal(key, (B, h // 4, w // 4, N), jnp.float32)
    sl = jax.random.normal(key, (B, h, w, C), jnp.float32)

    bench("g_a (AnalysisTransform)", AnalysisTransform(N=N, M=M), (x_img,))
    bench("h_a (HyperAnalysis)", HyperAnalysis(M=M, N=N), (y_lat,))
    bench("h_s (HyperSynthesis)", HyperSynthesis(M=M, N=N), (z_lat,))
    bench("g_s (SynthesisTransform)", SynthesisTransform(N=N, M=M), (y_lat,))

    bench("LocalContext", LocalContext(dim=C, window_size=cfg.context_window),
          (sl,), count=S)
    for i in (1, S - 1):
        cat = jax.random.normal(key, (B, h, w, C * i), jnp.float32)
        bench(f"ChannelContext[i={i}]",
              ChannelContext(out_dim=C, hidden=(192, 128)), (cat,))
        bench(f"GlobalInter[i={i}]",
              LinearGlobalInterContext(dim=C * i, out_dim=2 * C,
                                       num_heads=max(C * i // 32, 1)), (cat,))
    bench("GlobalIntra", LinearGlobalIntraContext(dim=C), (sl, sl),
          count=S - 1)

    ep_in = jax.random.normal(key, (B, h, w, 2 * M + 10 * C), jnp.float32)
    bench("EntropyParameters(widest)", EntropyParameters(out_dim=2 * C),
          (ep_in,), count=2 * S)
    lrp_in = jax.random.normal(key, (B, h, w, M + S * C), jnp.float32)
    bench("LRP(widest)",
          LatentResidualPrediction(out_dim=C, in_dim=M + S * C), (lrp_in,),
          count=2 * S)

    rows.sort(key=lambda r: -r["ms_per_pass"])
    print(json.dumps({"model": name, "batch": B, "latent": [h, w],
                      "modules": rows}))


if __name__ == "__main__":
    main()
