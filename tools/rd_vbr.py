"""VBR RD sweep: one trained model, every gain level + continuous rates.

Evaluates a trained MLICPlusPlusVbr checkpoint through REAL bitstream
files at every discrete gain level ``s`` (reference ``test_model_vbr``,
``utils/testing.py:427-571``) plus ``--interp`` continuous-rate points
between adjacent trained gains via ``inputscale`` (reference
``mlicpp_vbr.py:535,899`` — the central one-model-many-rates claim of
``mlicpp_vbr.py:83-91``).  Asserts the rate curve is monotone in the gain
and writes a results JSON.

Usage:
  python tools/rd_vbr.py --ckpt ckpts/s_vbr/checkpoint_best_loss \
      --out results/rd_vbr.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="VBR RD sweep through the real codec")
    p.add_argument("--model", default="MLICPP_S_VBR")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--images", default=None)
    p.add_argument("--n-images", type=int, default=6)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--interp", type=int, default=2,
                   help="continuous-rate points (geometric midpoints of "
                        "adjacent gains), coded via inputscale")
    p.add_argument("--backend", default="steps")
    p.add_argument("--save-dir", default="/tmp/rd_vbr_eval")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mlic_tpu.codec import Codec
    from mlic_tpu.eval import evaluate_codec
    from mlic_tpu.models.registry import get_model
    from tools.rd_curve import holdout_images, load_params

    images = holdout_images(args)
    model = get_model(args.model)
    params = load_params(args.ckpt)
    codec = Codec(model, params, backend=args.backend)
    codec.update()

    gains = np.abs(np.asarray(params["Gain"]))
    levels = list(range(len(gains)))
    points = []
    for s in levels:
        res = evaluate_codec(codec, images,
                             os.path.join(args.save_dir, f"s{s}"), s=s)
        res.update(level=s, gain=float(gains[s]),
                   lmbda=model.cfg.lmbda[s], kind="level")
        points.append(res)
        print(f"s={s} gain={gains[s]:.4f}: bpp={res['bpp']:.4f} "
              f"psnr={res['psnr']:.3f}", flush=True)

    # Continuous-rate interpolation: geometric midpoints of adjacent gains.
    mids = []
    if args.interp:
        order = np.argsort(gains)
        hi = order[-args.interp - 1:]
        for a, b in zip(hi[:-1], hi[1:]):
            mids.append(float(np.sqrt(gains[a] * gains[b])))
    for k, isc in enumerate(mids):
        res = evaluate_codec(codec, images,
                             os.path.join(args.save_dir, f"i{k}"),
                             s=0, inputscale=isc)
        res.update(level=None, gain=isc, lmbda=None, kind="inputscale")
        points.append(res)
        print(f"inputscale={isc:.4f}: bpp={res['bpp']:.4f} "
              f"psnr={res['psnr']:.3f}", flush=True)

    # Monotonicity: larger gain => finer quantization => more bits, better
    # quality (discrete levels AND interpolated points on one curve).
    pts = sorted(points, key=lambda r: r["gain"])
    bpps = [r["bpp"] for r in pts]
    psnrs = [r["psnr"] for r in pts]
    mono_rate = all(b2 >= b1 - 1e-4 for b1, b2 in zip(bpps, bpps[1:]))
    mono_psnr = all(p2 >= p1 - 0.05 for p1, p2 in zip(psnrs, psnrs[1:]))

    # ms_ssim is NaN for images with min side < 176 — emit null, not the
    # non-strict-JSON NaN literal.
    _f = lambda v, nd: None if not np.isfinite(v) else round(float(v), nd)
    curve = {
        "psnr": [round(r["psnr"], 4) for r in pts],
        "bpp": [round(r["bpp"], 6) for r in pts],
        "ms_ssim": [_f(r["ms_ssim"], 6) for r in pts],
        "gain": [round(r["gain"], 6) for r in pts],
        "level": [r["level"] for r in pts],
        "kind": [r["kind"] for r in pts],
        "monotone_rate": mono_rate,
        "monotone_psnr": mono_psnr,
        "model": args.model,
        "ckpt": args.ckpt,
        "eval_set": args.images
        or f"dead_leaves({args.n_images}x{args.image_size},seed=7919)",
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(curve, f, indent=2, allow_nan=False)
    print(json.dumps(curve))
    if not (mono_rate and mono_psnr):
        print("WARNING: curve not monotone", file=sys.stderr)


if __name__ == "__main__":
    main()
