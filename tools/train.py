"""Training CLI (reference ``MLIC++/playground/train.py`` + ``config/args.py``).

Example:
  python tools/train.py --model MLICPP_S --dataset /data/train \
      --lambda 0.0483 --metrics mse --batch-size 16 --steps 100000
Use --synthetic for a dataset-free smoke run.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MLIC-TPU training")
    p.add_argument("--model", default="MLICPP_S")
    p.add_argument("--dataset", default=None, help="training image folder")
    p.add_argument("--test-dataset", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--augment", default=None, choices=["autoaugment"],
                   help="extra augmentation for --dataset training "
                        "(reference AutoAugment, train.py:82)")
    p.add_argument("--synthetic-kind", default="waves",
                   choices=["waves", "dead_leaves"],
                   help="dataset-free source: smooth waves (smoke tests) or "
                        "a dead-leaves pool (natural-image surrogate for RD)")
    p.add_argument("--pool-size", type=int, default=512,
                   help="dead-leaves pool: number of pre-rendered images")
    p.add_argument("--pool-image-size", type=int, default=320)
    p.add_argument("--exp-name", default="mlic_tpu")
    p.add_argument("--lambda", dest="lmbda", type=float, default=0.0483)
    p.add_argument("--metrics", default="mse",
                   choices=["mse", "ms-ssim", "charbonnier"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--patch-size", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--clip-max-norm", type=float, default=1.0)
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--lr-milestones", type=int, nargs="*", default=[])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-freq", type=int, default=20)
    p.add_argument("--ckpt-dir", default="./ckpts")
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pretrained", default=None,
                   help="orbax checkpoint dir to warm-start params from "
                        "(partial, shape-filtered load; reference "
                        "train.py --pretrained + load_matching_state_dict)")
    p.add_argument("--freeze", default=None,
                   help="regex over flax param paths; matching params are "
                        "frozen (reference frezze_some_layers)")
    p.add_argument("--val-every", type=int, default=0,
                   help="run full-image validation every N steps (0=off)")
    p.add_argument("--val-images", type=int, default=4)
    p.add_argument("--save-recon", action="store_true",
                   help="save validation reconstruction PNGs")
    p.add_argument("--patch-milestones", nargs="*", default=[],
                   help="STEP:SIZE pairs; at STEP, switch the training patch "
                        "size (reference two-stage 256->512 recipe)")
    p.add_argument("--vbr", action="store_true", help="VBR multi-rate (MGDA) training")
    p.add_argument("--train-gain", action="store_true",
                   help="let gradients flow into the Gain vector (the "
                   "reference detaches it; see ModelConfig.train_gain)")
    p.add_argument("--vbr-gradnorm", default="none", choices=["none", "loss"],
                   help="MGDA-UB per-level gradient normalization (1/loss)")
    p.add_argument("--dual", action="store_true",
                   help="two-pass recompression training (train_one_epoch_dual)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--transform-dtype", default=None,
                   choices=["float32", "bfloat16", "bfloat16_mixed"],
                   help="compute dtype for g_a/h_a/g_s (TPU mixed precision; "
                        "entropy path stays fp32 — reference AMP, "
                        "utils/training.py:44-52). bfloat16_mixed keeps the "
                        "GDN norm contraction in bf16 w/ f32 accumulation "
                        "(no per-block cast round trips). Default: "
                        "bfloat16_mixed on accelerators (measured -10.6%% "
                        "ms/step vs fp32, interleaved in-program A/B), "
                        "float32 with --cpu")
    return p.parse_args(argv)


def _patch_schedule(args) -> list:
    """[(start_step_exclusive, patch_size), ...] sorted; first entry step 0."""
    sched = [(0, args.patch_size)]
    for item in args.patch_milestones:
        s, sz = item.split(":")
        sched.append((int(s), int(sz)))
    return sorted(sched)


def _patch_at(sched: list, step: int) -> int:
    size = sched[0][1]
    for s, sz in sched:
        if step >= s:
            size = sz
    return size


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlic_tpu.data.folder import ImageFolderDataset, synthetic_batches
    from mlic_tpu.models.registry import get_model
    from mlic_tpu.parallel import mesh as pmesh
    from mlic_tpu.train.trainer import (TrainConfig, create_train_state,
                                        make_eval_step, make_train_step)
    from mlic_tpu.utils.checkpoint import CheckpointManager, load_matching
    from mlic_tpu.utils.logger import MetricsWriter

    model = get_model(args.model)
    if args.transform_dtype is None:
        # Measured on TPU v5e (tools/microbench.py MB_SET=train, interleaved
        # in-program A/B): bfloat16_mixed 21.6-21.7 vs fp32 24.2-24.3
        # ms/step.  CPU keeps fp32 (bf16 is emulated there).
        args.transform_dtype = "float32" if args.cpu else "bfloat16_mixed"
    if args.transform_dtype or args.train_gain:
        import dataclasses
        repl = {}
        if args.transform_dtype:
            repl["transform_dtype"] = args.transform_dtype
        if args.train_gain:
            repl["train_gain"] = True
        model = type(model)(cfg=dataclasses.replace(model.cfg, **repl))
    cfg = TrainConfig(
        lmbda=args.lmbda, metric=args.metrics, learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate, clip_max_norm=args.clip_max_norm,
        optimizer=args.optimizer, lr_milestones=tuple(args.lr_milestones),
        warmup_steps=args.warmup_steps, seed=args.seed)

    shape = (args.batch_size, args.patch_size, args.patch_size, 3)
    state, tx = create_train_state(model, cfg, input_shape=shape)
    if args.freeze:
        from mlic_tpu.train.optimizers import freeze
        tx = freeze(tx, args.freeze)
    if args.vbr:
        from mlic_tpu.train.vbr import make_vbr_train_step
        step_fn = make_vbr_train_step(model, tx, cfg,
                                      gradnorm=args.vbr_gradnorm)
    elif args.dual:
        from mlic_tpu.train.trainer import make_dual_train_step
        step_fn = make_dual_train_step(model, tx, cfg)
    else:
        step_fn = make_train_step(model, tx, cfg)

    work_dir = os.path.join(args.ckpt_dir, args.exp_name)
    ckpt = CheckpointManager(work_dir)
    start_step = 0
    if args.pretrained:
        import orbax.checkpoint as ocp
        raw = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.pretrained))
        state = state.replace(params=load_matching(state.params, raw["params"]))
        print(f"warm-started params from {args.pretrained}")
    if args.resume:
        tag = ckpt.latest_tag()
        if tag:
            try:
                state = ckpt.restore(tag, state)
            except ValueError as e:
                # Optimizer-tree mismatch (e.g. the checkpoint was written
                # under a different lr-schedule config): fall back to a
                # params+step restore with a fresh optimizer — the moment
                # estimates rebuild within a few hundred steps.
                print(f"strict resume failed ({type(e).__name__}); "
                      "params-only restore with fresh optimizer state")
                import orbax.checkpoint as ocp
                raw = ocp.StandardCheckpointer().restore(
                    os.path.join(os.path.abspath(work_dir), f"checkpoint_{tag}"))
                state = state.replace(
                    params=load_matching(state.params, raw["params"]),
                    step=jnp.asarray(int(np.asarray(raw["step"])), jnp.int32))
            start_step = int(jax.device_get(state.step))
            print(f"resumed from step {start_step}")

    mesh = pmesh.make_mesh()
    state = pmesh.replicate(state, mesh)
    writer = MetricsWriter(os.path.join(work_dir, "logs"))

    sched = _patch_schedule(args)
    pool = None
    if (args.synthetic or not args.dataset) and args.synthetic_kind == "dead_leaves":
        from mlic_tpu.data.folder import dead_leaves_pool
        print(f"dead-leaves pool ({args.pool_size} x "
              f"{args.pool_image_size}^2, disk-cached after first render)...",
              flush=True)
        pool = dead_leaves_pool(args.pool_size, args.pool_image_size,
                                seed=args.seed)

    def make_batches(patch: int, n_steps: int, seed: int):
        if args.synthetic or not args.dataset:
            if pool is not None:
                from mlic_tpu.data.folder import pool_batches
                return pool_batches(pool, args.batch_size, patch, n_steps,
                                    seed=seed + 1)
            return synthetic_batches(args.batch_size, patch, n_steps, seed=seed)
        ds = ImageFolderDataset(args.dataset, patch,
                                process_index=jax.process_index(),
                                process_count=jax.process_count(), seed=seed,
                                augment=args.augment)
        return ds.batches(args.batch_size, n_steps)

    # Validation set: held-out full images (test dataset if given, else a
    # disjoint-seed synthetic pool), reference testing.py:107-201.
    val_images = []
    if args.val_every:
        if args.test_dataset:
            from mlic_tpu.data.folder import list_images, load_image
            from mlic_tpu.eval import pad_to_multiple
            for p in list_images(args.test_dataset)[:args.val_images]:
                img, _ = pad_to_multiple(
                    load_image(p).astype(np.float32)[None] / 255.0)
                val_images.append(img)
        elif pool is not None:
            from mlic_tpu.data.folder import dead_leaves_pool
            vp = dead_leaves_pool(args.val_images, args.pool_image_size,
                                  seed=args.seed + 7919)
            val_images = [vp[i].astype(np.float32) / 255.0
                          for i in range(len(vp))]
        else:
            val_images = [np.stack(list(synthetic_batches(
                1, 256, 1, seed=args.seed + 7919 + i)))[0, 0]
                for i in range(args.val_images)]
    eval_step = make_eval_step(model, cfg) if args.val_every else None

    def validate(step: int):
        rows = []
        for i, img in enumerate(val_images):
            x = jnp.asarray(img[None] if img.ndim == 3 else img)
            out = eval_step(state.params, x)
            rows.append((float(out["psnr"]), float(out["bpp_loss"])))
            if args.save_recon:
                from PIL import Image
                rec = np.clip(np.asarray(out["x_hat"][0]) * 255.0 + 0.5,
                              0, 255).astype(np.uint8)
                d = os.path.join(work_dir, "val")
                os.makedirs(d, exist_ok=True)
                Image.fromarray(rec).save(
                    os.path.join(d, f"step{step}_img{i}.png"))
        mean_psnr = sum(r[0] for r in rows) / max(len(rows), 1)
        mean_bpp = sum(r[1] for r in rows) / max(len(rows), 1)
        for i, (p, b) in enumerate(rows):
            print(f"  val[{i}] psnr={p:.3f} bpp={b:.4f}")
        print(f"val @ {step}: psnr={mean_psnr:.3f} bpp={mean_bpp:.4f}",
              flush=True)
        writer.write(step, {"psnr": mean_psnr, "bpp": mean_bpp}, prefix="val/")

    # uint8 batches (pool path) upload 4x fewer bytes through the ~32 MB/s
    # tunnel; normalization happens on device inside this jit wrapper (the
    # inner jitted step inlines).
    base_step_fn = step_fn
    u8_step_fn = jax.jit(
        lambda s, b: base_step_fn(s, b.astype(jnp.float32) / 255.0))

    step = start_step
    t0 = time.perf_counter()
    while step < args.steps:
        patch = _patch_at(sched, step)
        # run until the next patch milestone (static shapes: one jit per size)
        nxt = min([s for s, _ in sched if s > step] + [args.steps])
        seg = make_batches(patch, nxt - step, args.seed + step)
        for batch in seg:
            fn = u8_step_fn if batch.dtype == np.uint8 else base_step_fn
            sharded = pmesh.shard_batch(jnp.asarray(batch), mesh)
            state, metrics = fn(state, sharded)
            step += 1
            if step % args.log_freq == 0:
                vals = {k: float(v) for k, v in metrics.items()
                        if getattr(v, "ndim", 0) == 0}
                # Short vector metrics (VBR per-level losses / Frank-Wolfe
                # alpha) are monitoring signals, not noise — print inline
                # and write per-index rows (VERDICT r4 item 4: watch the
                # per-level alpha for tail starvation).
                vecs = {k: np.asarray(v) for k, v in metrics.items()
                        if getattr(v, "ndim", 0) == 1 and np.size(v) <= 8}
                dt = (time.perf_counter() - t0) / args.log_freq
                print(f"step {step} | {dt*1e3:.0f} ms/it | " +
                      " ".join(f"{k}={v:.4f}" for k, v in sorted(vals.items()))
                      + ("" if not vecs else " " + " ".join(
                          f"{k}=[" + ",".join(f"{x:.3f}" for x in v) + "]"
                          for k, v in sorted(vecs.items()))),
                      flush=True)
                writer.write(step, {**vals,
                                    **{f"{k}_{i}": float(x)
                                       for k, v in vecs.items()
                                       for i, x in enumerate(v)}},
                             prefix="train/")
                t0 = time.perf_counter()
            if args.val_every and step % args.val_every == 0:
                validate(step)
                t0 = time.perf_counter()
            if step % args.ckpt_every == 0 or step == args.steps:
                ckpt.save(str(step), state, loss=float(metrics["loss"]))
                print(f"saved checkpoint_{step}", flush=True)
    writer.close()


if __name__ == "__main__":
    main()
