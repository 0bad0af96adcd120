"""Classical-codec RD anchors (JPEG / WebP) on the held-out evaluation set.

The reference ships Kodak/Tecnick/CLIC anchors (``/root/reference/results``)
but those eval images are not available in this environment, so BD-rate
against them is undefined (no PSNR overlap on different content).  This
tool produces content-matched anchors instead: JPEG (PIL, 4:2:0) or WebP
(PIL) at a quality ladder on the SAME held-out images the RD sweep
evaluates, in the same JSON format, so ``tools/bdrate.py`` yields a
meaningful BD-rate for the learned codec.

Usage:
  python tools/jpeg_anchor.py --out results/rd_jpeg_dead_leaves.json
  python tools/jpeg_anchor.py --codec webp --out results/rd_webp_dead_leaves.json
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Classical-codec RD anchor")
    p.add_argument("--out", required=True)
    p.add_argument("--codec", choices=("jpeg", "webp"), default="jpeg")
    p.add_argument("--images", default=None, help="eval image folder "
                   "(default: the RD sweep's held-out dead-leaves set)")
    p.add_argument("--n-images", type=int, default=8)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--qualities", nargs="+", type=int,
                   default=[10, 20, 35, 50, 65, 80, 92])
    return p.parse_args(argv)


def main(argv=None):
    import numpy as np
    from PIL import Image

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mlic_tpu.metrics import ms_ssim, psnr

    args = parse_args(argv)
    if args.images:
        from mlic_tpu.data.folder import list_images, load_image
        imgs = [load_image(p) for p in list_images(args.images)[:args.n_images]]
    else:
        from mlic_tpu.data.folder import dead_leaves_pool
        pool = dead_leaves_pool(args.n_images, args.image_size, seed=7919)
        imgs = [pool[i] for i in range(len(pool))]

    fmt = {"jpeg": "JPEG", "webp": "WEBP"}[args.codec]

    points = []
    for q in args.qualities:
        bpp_sum = psnr_sum = ms_sum = 0.0
        ms_n = 0  # images large enough for the 5-scale MS-SSIM pyramid
        for img in imgs:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format=fmt, quality=q)
            n_bits = 8 * buf.getbuffer().nbytes
            dec = np.asarray(Image.open(buf).convert("RGB"))
            a = jnp.asarray(img.astype(np.float32) / 255.0)[None]
            b = jnp.asarray(dec.astype(np.float32) / 255.0)[None]
            bpp_sum += n_bits / (img.shape[0] * img.shape[1])
            psnr_sum += float(psnr(a, b))
            if min(img.shape[:2]) >= 176:
                ms_sum += float(ms_ssim(a, b))
                ms_n += 1
        n = len(imgs)
        points.append({"quality": q, "bpp": bpp_sum / n, "psnr": psnr_sum / n,
                       "ms_ssim": ms_sum / ms_n if ms_n else None})
        print(f"q={q}: bpp={points[-1]['bpp']:.4f} "
              f"psnr={points[-1]['psnr']:.3f}", flush=True)

    points.sort(key=lambda r: r["bpp"])
    curve = {
        "psnr": [round(r["psnr"], 4) for r in points],
        "bpp": [round(r["bpp"], 6) for r in points],
        "ms_ssim": [None if r["ms_ssim"] is None else round(r["ms_ssim"], 6)
                    for r in points],
        "quality": [r["quality"] for r in points],
        "codec": {"jpeg": "JPEG (PIL, 4:2:0)", "webp": "WebP (PIL)"}[args.codec],
        "eval_set": args.images
        or f"dead_leaves({args.n_images}x{args.image_size},seed=7919)",
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(curve, f, indent=2, allow_nan=False)
    print(json.dumps(curve))


if __name__ == "__main__":
    main()
