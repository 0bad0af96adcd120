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
    p.add_argument("--vbr", action="store_true", help="VBR multi-rate (MGDA) training")
    p.add_argument("--dual", action="store_true",
                   help="two-pass recompression training (train_one_epoch_dual)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from mlic_tpu.data.folder import ImageFolderDataset, synthetic_batches
    from mlic_tpu.models.registry import get_model
    from mlic_tpu.parallel import mesh as pmesh
    from mlic_tpu.train.trainer import TrainConfig, create_train_state, make_train_step
    from mlic_tpu.utils.checkpoint import CheckpointManager

    model = get_model(args.model)
    cfg = TrainConfig(
        lmbda=args.lmbda, metric=args.metrics, learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate, clip_max_norm=args.clip_max_norm,
        optimizer=args.optimizer, lr_milestones=tuple(args.lr_milestones),
        warmup_steps=args.warmup_steps, seed=args.seed)

    shape = (args.batch_size, args.patch_size, args.patch_size, 3)
    state, tx = create_train_state(model, cfg, input_shape=shape)
    if args.vbr:
        from mlic_tpu.train.vbr import make_vbr_train_step
        step_fn = make_vbr_train_step(model, tx, cfg)
    elif args.dual:
        from mlic_tpu.train.trainer import make_dual_train_step
        step_fn = make_dual_train_step(model, tx, cfg)
    else:
        step_fn = make_train_step(model, tx, cfg)

    mesh = pmesh.make_mesh()
    state = pmesh.replicate(state, mesh)

    ckpt = CheckpointManager(os.path.join(args.ckpt_dir, args.exp_name))
    start_step = 0
    if args.resume:
        tag = ckpt.latest_tag()
        if tag:
            state = ckpt.restore(tag, state)
            start_step = int(jax.device_get(state.step))
            print(f"resumed from step {start_step}")

    if args.synthetic or not args.dataset:
        batches = synthetic_batches(args.batch_size, args.patch_size,
                                    args.steps - start_step, seed=args.seed)
    else:
        ds = ImageFolderDataset(args.dataset, args.patch_size,
                                process_index=jax.process_index(),
                                process_count=jax.process_count(), seed=args.seed)
        batches = ds.batches(args.batch_size, args.steps - start_step)

    t0 = time.perf_counter()
    for i, batch in enumerate(batches):
        sharded = pmesh.shard_batch(jnp.asarray(batch), mesh)
        state, metrics = step_fn(state, sharded)
        step = start_step + i + 1
        if step % args.log_freq == 0:
            vals = {k: float(v) for k, v in metrics.items()
                    if getattr(v, "ndim", 0) == 0}
            dt = (time.perf_counter() - t0) / args.log_freq
            print(f"step {step} | {dt*1e3:.0f} ms/it | " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(vals.items())))
            t0 = time.perf_counter()
        if step % args.ckpt_every == 0 or step == args.steps:
            ckpt.save(str(step), state, loss=float(metrics["loss"]))
            print(f"saved checkpoint_{step}")


if __name__ == "__main__":
    main()
