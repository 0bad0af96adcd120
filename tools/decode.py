"""Standalone decoder CLI (reference ``MLIC++/submit/decode.py:28-64``):
scan a directory of .bin bitstreams, decode each, save PNGs."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description="MLIC-TPU standalone decoder")
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--bitstream-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vbr", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from mlic_tpu.codec import Codec
    from mlic_tpu.eval import decompress_one_image
    from mlic_tpu.models.registry import get_model

    model = get_model(args.model)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 256, 256, 3)))["params"]
    if args.checkpoint:
        from mlic_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        restored = mgr.restore(
            os.path.basename(args.checkpoint).replace("checkpoint_", ""),
            {"params": params})
        params = restored.get("params", restored)

    codec = Codec(model, params)
    codec.update()
    os.makedirs(args.output_dir, exist_ok=True)
    for name in sorted(os.listdir(args.bitstream_dir)):
        if not name.endswith((".bin", ".bit")):
            continue
        path = os.path.join(args.bitstream_dir, name)
        out = decompress_one_image(codec, path, vbr=args.vbr)
        img = np.clip(np.asarray(out["x_hat"])[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
        dst = os.path.join(args.output_dir, os.path.splitext(name)[0] + ".png")
        Image.fromarray(img).save(dst)
        print(f"{name} -> {dst} ({out['dec_time']*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
