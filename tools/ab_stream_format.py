"""Interleaved stream-format A/B on the real chip: v3 (separate host-coded
z strings) vs v4 (hyper-latent inline, fully on-device entropy coding).

One process, two Codec instances sharing params; alternating pipelined
segments cancel co-tenant contention drift.  Reports per-segment img/s for
both the staged (device-resident input) and tunnel (host upload) regimes.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("AB_BATCH", "128"))
SEG = int(os.environ.get("AB_SEG", "3"))        # batches per segment
REPS = int(os.environ.get("AB_REPS", "4"))      # segments per arm
H, W = 512, 768

from mlic_tpu.codec import Codec
from mlic_tpu.data.folder import dead_leaves_pool
from mlic_tpu.models.registry import get_model

model = get_model("MLICPP_S")
model = type(model)(cfg=dataclasses.replace(model.cfg,
                                            transform_dtype="bfloat16"))
rng = {"params": jax.random.key(0), "noise": jax.random.key(1)}
x0 = jnp.zeros((BATCH, H, W, 3), jnp.float32)
t = time.perf_counter()
params = jax.jit(lambda r, v: model.init(r, v, True))(rng, x0)["params"]
jax.block_until_ready(params)
print(f"init {time.perf_counter()-t:.0f}s", file=sys.stderr, flush=True)

import orbax.checkpoint as ocp
from mlic_tpu.utils.checkpoint import load_matching
raw = ocp.StandardCheckpointer().restore("/root/repo/ckpts/bench_default")
params = load_matching(params, raw.get("params", raw))

os.environ["MLIC_UNIFIED_Z"] = "0"
c3 = Codec(model, params, backend="device", n_lanes=512, encode_recon=False)
os.environ["MLIC_UNIFIED_Z"] = "1"
c4 = Codec(model, params, backend="device", n_lanes=512, encode_recon=False)
t = time.perf_counter()
c3.update(); c4.update()
print(f"update {time.perf_counter()-t:.0f}s", file=sys.stderr, flush=True)

pool = dead_leaves_pool(24, H, seed=1303, width=W)
host_batches = [pool[[(k * BATCH + i) % len(pool) for i in range(BATCH)]]
                for k in range(SEG + 1)]
dev = jax.devices()[0]
pool_dev = jax.device_put(np.asarray(pool), dev)
staged_batches = [pool_dev[jnp.asarray(
    [(k * BATCH + i) % len(pool) for i in range(BATCH)])]
    for k in range(SEG + 1)]
jax.block_until_ready(staged_batches)


def pipeline_run(codec, imgs):
    bits = 0
    t0 = time.perf_counter()
    h_enc = codec.compress_begin(imgs[0])
    dec_pending = None
    for k in range(len(imgs)):
        nxt = codec.compress_begin(imgs[k + 1]) if k + 1 < len(imgs) else None
        enc = codec.compress_end(h_enc)
        bits += 8 * sum(len(s) for g in enc["strings"] for s in g)
        dec = codec.decompress(enc["strings"], enc["shape"], wait=False)
        if dec_pending is not None:
            assert np.isfinite(float(jnp.sum(dec_pending["x_hat"])))
        dec_pending = dec
        h_enc = nxt
    assert np.isfinite(float(jnp.sum(dec_pending["x_hat"])))
    return time.perf_counter() - t0, bits


# warmup (compiles both codecs' programs; also equalizes bucket ratchets)
for name, c in (("v3", c3), ("v4", c4)):
    t = time.perf_counter()
    el, bits = pipeline_run(c, staged_batches[:2])
    print(f"warmup {name}: {time.perf_counter()-t:.0f}s "
          f"bpp={bits/(2*BATCH*H*W):.4f}", file=sys.stderr, flush=True)

res = {"staged": {"v3": [], "v4": []}, "tunnel": {"v3": [], "v4": []}}
bpps = {}
for rep in range(REPS):
    for name, c in (("v3", c3), ("v4", c4)):
        el, bits = pipeline_run(c, staged_batches[1:SEG + 1])
        res["staged"][name].append(round(SEG * BATCH / el, 3))
        bpps[name] = bits / (SEG * BATCH * H * W)
    for name, c in (("v3", c3), ("v4", c4)):
        el, bits = pipeline_run(c, host_batches[1:SEG + 1])
        res["tunnel"][name].append(round(SEG * BATCH / el, 3))
    print(f"rep {rep}: {res}", file=sys.stderr, flush=True)

med = lambda xs: sorted(xs)[len(xs) // 2]
out = {k: {n: {"median": med(v), "all": v} for n, v in d.items()}
       for k, d in res.items()}
out["bpp"] = {k: round(v, 4) for k, v in bpps.items()}
# paired per-rep ratios cancel window drift
for reg in ("staged", "tunnel"):
    r = [b / a for a, b in zip(res[reg]["v3"], res[reg]["v4"])]
    out[reg]["v4_over_v3_paired"] = [round(x, 4) for x in r]
    out[reg]["v4_over_v3_median"] = round(med(r), 4)
print(json.dumps(out))
