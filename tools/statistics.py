"""Per-image codec statistics -> CSV.

Equivalent of the reference ``EXPTrainer`` statistics run
(``MLIC++/playground/compression_trainer.py:739-930``): evaluate every image
in a folder, write per-image bpp / PSNR / MS-SSIM rows to a CSV for
dataset-distribution analysis (consumed by ``mlic_tpu.analysis.compare``).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--dataset", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="stats.csv")
    p.add_argument("--lambda", dest="lmbda", type=float, default=0.0483)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlic_tpu.data.folder import list_images, load_image
    from mlic_tpu.eval import pad_to_multiple, crop_to
    from mlic_tpu.loss import rate_distortion_loss_per_sample
    from mlic_tpu.metrics import ms_ssim, psnr
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

    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v, False))

    # Per-process shard of the image list; results are gathered to host 0
    # (reference dist.gather_object, compression_trainer.py:844-878).
    files_all = list_images(args.dataset)
    pid, pcount = jax.process_index(), jax.process_count()

    rows = []
    for path in files_all[pid::pcount]:
        img = load_image(path).astype(np.float32) / 255.0
        padded, hw = pad_to_multiple(img[None])
        out = fwd(params, jnp.asarray(padded))
        rd = rate_distortion_loss_per_sample(out, jnp.asarray(padded), args.lmbda)
        x_hat = crop_to(np.asarray(out["x_hat"]), hw)
        x = img[None]
        rows.append({
            "name": os.path.basename(path),
            "bpp": float(rd["bpp_loss"][0]),
            "psnr": float(psnr(jnp.asarray(x_hat), jnp.asarray(x))),
            "ms_ssim": float(ms_ssim(jnp.asarray(x_hat), jnp.asarray(x)))
            if min(hw) >= 176 else float("nan"),
        })
        print(rows[-1])

    if pcount > 1:
        from mlic_tpu.parallel.mesh import process_allgather
        rows = gather_rows(rows, files_all, pid, pcount, process_allgather)
        if pid != 0:
            return

    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["name", "bpp", "psnr", "ms_ssim"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")


def gather_rows(rows, files_all, pid, pcount, allgather):
    """Gather per-process numeric stats to every host and rebuild the full
    row list.  Names are NOT transmitted: every process derives the same
    round-robin file sharding, so host 0 reconstructs who measured what.
    Shards may differ in length by one; rows are nan-padded to align."""
    import numpy as np

    maxn = (len(files_all) + pcount - 1) // pcount
    vals = np.full((maxn, 3), np.nan, np.float32)
    for i, r in enumerate(rows):
        vals[i] = (r["bpp"], r["psnr"], r["ms_ssim"])
    gathered = np.asarray(allgather(vals))  # [pcount, maxn, 3]
    out = []
    for p in range(pcount):
        names = [os.path.basename(f) for f in files_all[p::pcount]]
        for i, name in enumerate(names):
            b, ps, ms = (float(x) for x in gathered[p, i])
            out.append({"name": name, "bpp": b, "psnr": ps, "ms_ssim": ms})
    return out


if __name__ == "__main__":
    main()
