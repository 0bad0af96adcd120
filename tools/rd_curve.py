"""Build an RD curve from trained checkpoints through the REAL codec.

For each (checkpoint, lambda): restore params, build the entropy tables
(``Codec.update``), round-trip a held-out image set through actual
bitstream files, and record measured bpp / PSNR / MS-SSIM.  Output JSON
matches the reference's results format
(``/root/reference/results/kodak/mlicplusplus_mse.json``) so it feeds
directly into ``tools/bdrate.py``.

Usage:
  python tools/rd_curve.py --model MLICPP_S \
      --ckpts ckpts/rd_q5/checkpoint_best_loss ckpts/rd_q4/checkpoint_best_loss \
      --lambdas 0.0483 0.025 --out results/rd_s.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="RD curve through the real codec")
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--ckpts", nargs="+", required=True,
                   help="orbax checkpoint dirs (one per lambda)")
    p.add_argument("--lambdas", nargs="+", type=float, required=True)
    p.add_argument("--out", required=True, help="output curve JSON")
    p.add_argument("--images", default=None,
                   help="eval image folder; default: held-out dead-leaves")
    p.add_argument("--n-images", type=int, default=8)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--backend", default="steps",
                   help="codec backend; 'steps' (default) writes single-"
                        "stream bitstreams with ~8 bytes overhead, matching "
                        "the reference's format — the interleaved device "
                        "format pays ~6 bytes/lane (0.05-0.1 bpp at 320^2) "
                        "which would distort low-rate RD points")
    p.add_argument("--save-dir", default="/tmp/rd_eval")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def load_params(path: str):
    import orbax.checkpoint as ocp
    raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return raw["params"] if "params" in raw else raw


def holdout_images(args):
    import numpy as np
    if args.images:
        from mlic_tpu.data.folder import list_images, load_image
        from mlic_tpu.eval import pad_to_multiple
        out = []
        for p in list_images(args.images)[:args.n_images]:
            img, _ = pad_to_multiple(load_image(p).astype(np.float32)[None] / 255.0)
            out.append(img)
        return out
    from mlic_tpu.data.folder import dead_leaves_pool
    pool = dead_leaves_pool(args.n_images, args.image_size, seed=7919)
    return [pool[i].astype(np.float32)[None] / 255.0 for i in range(len(pool))]


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from mlic_tpu.codec import Codec
    from mlic_tpu.eval import evaluate_codec
    from mlic_tpu.models.registry import get_model

    assert len(args.ckpts) == len(args.lambdas)
    backend = args.backend
    images = holdout_images(args)
    model = get_model(args.model)

    points = []
    for ckpt, lmbda in zip(args.ckpts, args.lambdas):
        print(f"=== lambda={lmbda} ckpt={ckpt}", flush=True)
        params = load_params(ckpt)
        codec = Codec(model, params, backend=backend)
        t0 = time.perf_counter()
        codec.update()
        print(f"tables built in {time.perf_counter()-t0:.1f}s", flush=True)
        res = evaluate_codec(codec, images,
                             os.path.join(args.save_dir, f"l{lmbda}"))
        res["lambda"] = lmbda
        points.append(res)
        print(f"lambda={lmbda}: bpp={res['bpp']:.4f} psnr={res['psnr']:.3f} "
              f"ms-ssim={res['ms_ssim']:.5f}", flush=True)

    points.sort(key=lambda r: r["bpp"])
    curve = {
        "psnr": [round(r["psnr"], 4) for r in points],
        "bpp": [round(r["bpp"], 6) for r in points],
        "ms_ssim": [round(r["ms_ssim"], 6) for r in points],
        "lambda": [r["lambda"] for r in points],
        "enc_time": [round(r["enc_time"], 4) for r in points],
        "dec_time": [round(r["dec_time"], 4) for r in points],
        "n_images": points[0]["n_images"] if points else 0,
        "eval_set": args.images or f"dead_leaves({args.n_images}x{args.image_size},seed=7919)",
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(curve, f, indent=2)
    print(json.dumps(curve))


if __name__ == "__main__":
    main()
