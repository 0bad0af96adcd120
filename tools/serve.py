"""Batch serving CLI: pipelined compress(+verify) of an image stream.

Drives ``Codec.roundtrip_stream`` (two-deep compress/decompress pipeline,
device backend) — or its mesh-sharded ``ShardedCodec`` variant — over a
directory of images or a synthetic dead-leaves stream, writes one ``.bin``
container per image, and prints a one-line JSON summary.

This is the deployment-shaped loop the bench measures: the reference has
no serving driver (its eval loop is one-image-at-a-time,
``MLIC++/utils/testing.py:403-571``).

Usage:
  python tools/serve.py --synthetic --n 32 --batch 8 --out /tmp/streams
  python tools/serve.py --images DIR --ckpt ckpts/bench_default --verify
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description="MLIC-TPU pipelined serving")
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--ckpt", default=None, help="orbax params checkpoint dir")
    p.add_argument("--images", default=None, help="directory of images")
    p.add_argument("--synthetic", action="store_true",
                   help="serve synthetic dead-leaves frames")
    p.add_argument("--n", type=int, default=16, help="synthetic frame count")
    p.add_argument("--size", type=int, nargs=2, default=(512, 768),
                   metavar=("H", "W"))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--out", default=None, help="write .bin containers here")
    p.add_argument("--verify", action="store_true",
                   help="decode every batch and fence the reconstruction")
    p.add_argument("--sharded", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlic_tpu.codec import Codec
    from mlic_tpu.models.registry import get_model
    from mlic_tpu.utils import bitstream

    model = get_model(args.model)
    h, w = args.size
    assert h % 64 == 0 and w % 64 == 0, "serve expects pre-padded sizes"

    if args.images:
        from PIL import Image
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".ppm")))
        frames = []
        for fp in paths:
            a = np.asarray(Image.open(fp).convert("RGB"), np.uint8)
            a = a[:h, :w]  # serve crops to the static shape
            if a.shape[:2] != (h, w):
                continue
            frames.append(a)
        names = [os.path.splitext(os.path.basename(fp))[0] for fp in paths]
    else:
        from mlic_tpu.data.folder import dead_leaves_pool
        frames = list(dead_leaves_pool(args.n, h, seed=1303, width=w))
        names = [f"frame{i:04d}" for i in range(len(frames))]
    n = (len(frames) // args.batch) * args.batch
    assert n > 0, "not enough same-size images for one batch"
    frames = frames[:n]

    rng = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    x0 = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(rng, x0)["params"]
    if args.ckpt:
        import orbax.checkpoint as ocp

        from mlic_tpu.utils.checkpoint import load_matching
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
        params = load_matching(params, raw.get("params", raw))

    if args.sharded:
        from mlic_tpu.parallel.mesh import make_mesh
        from mlic_tpu.parallel.serving import ShardedCodec
        codec = ShardedCodec(model, params, make_mesh(), n_lanes=args.lanes,
                             encode_recon=args.verify)
        codec.update()
    else:
        codec = Codec(model, params, backend="device", n_lanes=args.lanes,
                      encode_recon=args.verify)
        codec.update()

    batches = [np.stack(frames[k:k + args.batch])
               for k in range(0, n, args.batch)]
    # warmup batch compiles both directions (not timed)
    warm = codec.compress(batches[0])
    if args.verify:
        d = codec.decompress(warm["strings"], warm["shape"])
        jax.block_until_ready(d["x_hat"])

    total_bits = 0
    t0 = time.perf_counter()
    if args.verify:
        it = codec.roundtrip_stream(batches)
        for k, (enc, dec) in enumerate(it):
            total_bits += 8 * sum(len(s) for g in enc["strings"] for s in g)
            checksum = float(jnp.sum(dec["x_hat"]))
            assert np.isfinite(checksum)
            _write(args.out, names, k, args.batch, enc, bitstream, (h, w))
    else:
        hnd = codec.compress_begin(batches[0])
        for k in range(len(batches)):
            nxt = (codec.compress_begin(batches[k + 1])
                   if k + 1 < len(batches) else None)
            enc = codec.compress_end(hnd)
            total_bits += 8 * sum(len(s) for g in enc["strings"] for s in g)
            _write(args.out, names, k, args.batch, enc, bitstream, (h, w))
            hnd = nxt
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "images": n, "img_s": round(n / elapsed, 4),
        "bpp": round(total_bits / (n * h * w), 4),
        "verify": args.verify, "sharded": args.sharded,
        "device": str(jax.devices()[0])}))


def _write(out_dir, names, k, batch, enc, bitstream, hw):
    """Per-image containers in the eval/decode-CLI format
    ((h, w) header + body — ``eval.compress_one_image``)."""
    if not out_dir:
        return
    os.makedirs(out_dir, exist_ok=True)
    for j in range(batch):
        b = k * batch + j
        strings = [[enc["strings"][0][j]], [enc["strings"][1][j]]]
        with open(os.path.join(out_dir, names[b] + ".bin"), "wb") as f:
            bitstream.write_uints(f, hw)
            bitstream.write_body(f, enc["shape"], strings)


if __name__ == "__main__":
    main()
