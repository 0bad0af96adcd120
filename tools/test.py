"""Offline evaluation CLI (reference ``playground/test.py`` → ``test_model``).

Compresses every image in a folder to real bitstream files, decompresses,
and reports bpp / PSNR / MS-SSIM / enc+dec wall-clock.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description="MLIC-TPU codec evaluation")
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--dataset", required=True, help="image folder (e.g. Kodak)")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--save-dir", default="./runs/eval")
    p.add_argument("--level", type=int, default=None, help="VBR gain level")
    p.add_argument("--backend", default="steps", choices=["steps", "fused", "device"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from mlic_tpu.codec import Codec
    from mlic_tpu.data.folder import list_images, load_image
    from mlic_tpu.eval import evaluate_codec
    from mlic_tpu.models.registry import get_model
    import jax.numpy as jnp
    import numpy as np

    model = get_model(args.model)
    files = list_images(args.dataset)
    first = load_image(files[0]).astype(np.float32) / 255.0

    init_shape = (1, 256, 256, 3)
    params = jax.jit(lambda r, v: model.init(r, v, True))(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros(init_shape))["params"]
    if args.checkpoint:
        from mlic_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        restored = mgr.restore(os.path.basename(args.checkpoint).replace("checkpoint_", ""),
                               {"params": params})
        params = restored["params"] if "params" in restored else restored

    codec = Codec(model, params, backend=args.backend)
    codec.update()

    def image_iter():
        for f in files:
            yield load_image(f).astype(np.float32) / 255.0

    results = evaluate_codec(codec, image_iter(), args.save_dir, s=args.level)
    print("avg:", {k: round(v, 5) if isinstance(v, float) else v
                   for k, v in results.items()})


if __name__ == "__main__":
    main()
