"""Training driver: fused RD + aux update, data-parallel over a mesh.

TPU restructuring of the reference's training loop
(``MLIC++/utils/training.py:48-121``, ``playground/train.py:203-256``):

* One jitted ``train_step`` computes RD loss + aux loss in a single backward
  (the aux loss reaches only the quantile params — see
  ``train/optimizers.py``), applies per-group Adam with main-branch gradient
  clipping.  AMP is replaced by bf16 compute where enabled (TPU-native mixed
  precision; master params stay fp32).
* Data parallelism: batch sharded over a 1-D mesh, params replicated; XLA
  inserts the gradient all-reduce (no DDP hooks).
* Checkpoint/resume with orbax (``utils/checkpoint.py``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mlic_tpu.loss import rate_distortion_loss
from mlic_tpu.models.mlicpp import MLICPlusPlus
from mlic_tpu.parallel import mesh as pmesh
from mlic_tpu.train.optimizers import make_optimizer, multistep_lr


@dataclasses.dataclass
class TrainConfig:
    lmbda: float = 0.0483
    metric: str = "mse"                # mse | ms-ssim | charbonnier
    learning_rate: float = 1e-4
    aux_learning_rate: float = 1e-3
    clip_max_norm: float = 1.0
    optimizer: str = "adam"
    lr_milestones: tuple = ()          # step indices for 10x decay
    warmup_steps: int = 0              # linear LR warmup (reference warmup.py)
    seed: int = 0


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(model: MLICPlusPlus, cfg: TrainConfig,
                       input_shape=(1, 256, 256, 3)) -> tuple[TrainState, optax.GradientTransformation]:
    rng = jax.random.key(cfg.seed)
    p_rng, n_rng, loop_rng = jax.random.split(rng, 3)
    x = jnp.zeros(input_shape, jnp.float32)
    params = jax.jit(lambda r, x: model.init(r, x, True))(
        {"params": p_rng, "noise": n_rng}, x)["params"]
    if cfg.warmup_steps:
        warm = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        # join_schedules feeds (step - boundary) to the second schedule, so
        # absolute milestone indices must be shifted by the warmup length.
        after = (multistep_lr(cfg.learning_rate,
                              [m - cfg.warmup_steps for m in cfg.lr_milestones])
                 if cfg.lr_milestones else (lambda step: cfg.learning_rate))
        lr = optax.join_schedules([warm, after], [cfg.warmup_steps])
    else:
        lr = (multistep_lr(cfg.learning_rate, cfg.lr_milestones)
              if cfg.lr_milestones else cfg.learning_rate)
    tx = make_optimizer(lr, cfg.aux_learning_rate, cfg.clip_max_norm, cfg.optimizer)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, rng=loop_rng)
    return state, tx


def make_train_step(model: MLICPlusPlus, tx: optax.GradientTransformation,
                    cfg: TrainConfig) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics)."""

    def loss_fn(params, batch, noise_rng):
        out = model.apply({"params": params}, batch, True,
                          rngs={"noise": noise_rng})
        rd = rate_distortion_loss(out, batch, cfg.lmbda, cfg.metric)
        aux = model.apply({"params": params}, method=MLICPlusPlus.aux_loss)
        return rd["loss"] + aux, (rd, aux)

    @jax.jit
    def train_step(state: TrainState, batch: jax.Array):
        rng, noise_rng = jax.random.split(state.rng)
        grads, (rd, aux) = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, noise_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in rd.items()}
        metrics["aux_loss"] = aux
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng)
        return new_state, metrics

    return train_step


def make_dual_train_step(model: MLICPlusPlus, tx: optax.GradientTransformation,
                         cfg: TrainConfig) -> Callable:
    """Two-pass recompression training (reference ``train_one_epoch_dual``,
    ``MLIC++/utils/training.py:124-207``): pass 1 on the image at lambda,
    pass 2 re-compresses the detached reconstruction judged against the
    original image at lambda/2; one fused backward."""

    def loss_fn(params, batch, rng1, rng2):
        out1 = model.apply({"params": params}, batch, True, rngs={"noise": rng1})
        rd1 = rate_distortion_loss(out1, batch, cfg.lmbda, cfg.metric)
        recompressed = jax.lax.stop_gradient(jnp.clip(out1["x_hat"], 0.0, 1.0))
        out2 = model.apply({"params": params}, recompressed, True,
                           rngs={"noise": rng2})
        rd2 = rate_distortion_loss(out2, batch, cfg.lmbda * 0.5, cfg.metric)
        aux = model.apply({"params": params}, method=MLICPlusPlus.aux_loss)
        return rd1["loss"] + rd2["loss"] + aux, (rd1, rd2, aux)

    @jax.jit
    def train_step(state: TrainState, batch: jax.Array):
        rng, r1, r2 = jax.random.split(state.rng, 3)
        grads, (rd1, rd2, aux) = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, r1, r2)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {f"first_{k}": v for k, v in rd1.items()}
        metrics.update({k: v for k, v in rd2.items()})
        metrics["aux_loss"] = aux
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), metrics

    return train_step


def make_poelic_train_step(model: MLICPlusPlus, tx: optax.GradientTransformation,
                           cfg: TrainConfig, vgg_apply, vgg_params) -> Callable:
    """Perceptual (POELIC) training step: Charbonnier + VGG-feature +
    patch-style loss (reference ``POELIC_Loss_Trainer``,
    ``compression_trainer.py:733-736`` with ``rd_loss.py:199-260``)."""
    from mlic_tpu.perceptual import rate_distortion_poelic_loss

    def loss_fn(params, batch, noise_rng):
        out = model.apply({"params": params}, batch, True,
                          rngs={"noise": noise_rng})
        rd = rate_distortion_poelic_loss(out, batch, cfg.lmbda,
                                         vgg_apply, vgg_params)
        aux = model.apply({"params": params}, method=MLICPlusPlus.aux_loss)
        return rd["loss"] + aux, (rd, aux)

    @jax.jit
    def train_step(state: TrainState, batch: jax.Array):
        rng, noise_rng = jax.random.split(state.rng)
        grads, (rd, aux) = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, noise_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(rd)
        metrics["aux_loss"] = aux
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), metrics

    return train_step


def make_eval_step(model: MLICPlusPlus, cfg: TrainConfig) -> Callable:
    """Full-image eval forward (round quantization), RD metrics + PSNR."""

    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch, False)
        rd = rate_distortion_loss(out, batch, cfg.lmbda, cfg.metric)
        mse = jnp.mean(jnp.square(out["x_hat"] - batch))
        rd["psnr"] = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        rd["x_hat"] = out["x_hat"]
        return rd

    return eval_step


class Trainer:
    """Epoch-loop driver (OO equivalent of the reference ``BaseTrainer`` /
    ``Trainer``, ``MLIC++/playground/compression_trainer.py:26-329``)."""

    def __init__(self, model: MLICPlusPlus, cfg: TrainConfig,
                 mesh=None, input_shape=(8, 256, 256, 3), log_fn=print):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.log = log_fn
        self.state, self.tx = create_train_state(model, cfg, input_shape)
        self.state = pmesh.replicate(self.state, self.mesh)
        self.train_step = make_train_step(model, self.tx, cfg)
        self.eval_step = make_eval_step(model, cfg)

    def fit_epoch(self, batches: Iterable[np.ndarray], log_freq: int = 20) -> dict:
        last = {}
        metrics = None
        t0 = time.perf_counter()
        for i, batch in enumerate(batches):
            sharded = pmesh.shard_batch(jnp.asarray(batch, jnp.float32), self.mesh)
            self.state, metrics = self.train_step(self.state, sharded)
            if (i + 1) % log_freq == 0:
                last = {k: float(v) for k, v in metrics.items()}
                step = int(jax.device_get(self.state.step))
                dt = (time.perf_counter() - t0) / log_freq
                self.log(f"step {step} | {dt*1e3:.0f} ms/it | " +
                         " ".join(f"{k}={v:.4f}" for k, v in sorted(last.items())))
                t0 = time.perf_counter()
        if metrics is None:
            raise ValueError("fit_epoch received an empty batch iterable")
        if not last:
            last = {k: float(v) for k, v in metrics.items()}
        return last

    def evaluate(self, images: Iterable[np.ndarray],
                 save_recon_dir: str | None = None,
                 tag: str = "") -> dict:
        """Full-image validation pass (reference ``test_one_epoch``,
        ``MLIC++/utils/testing.py:107-201``): per-image RD forward with
        round quantization, PSNR + MS-SSIM on the unpadded pixels,
        mean aggregation, optional reconstruction dump.

        Images may be [H,W,3] or [1,H,W,3] float in [0,1] of any size;
        each is padded to the model's 64-multiple (metrics are computed
        on the original extent only) — one jit specialization per padded
        shape, so validation sets of uniform size compile once.

        Returns means plus ``per_image`` rows
        ``(psnr, ms_ssim, bpp, loss)`` for dispersion checks."""
        from mlic_tpu.eval import pad_to_multiple
        from mlic_tpu.metrics import ms_ssim as _ms_ssim

        totals: dict[str, float] = {}
        rows = []
        n = 0
        for i, img in enumerate(images):
            x = np.asarray(img, np.float32)
            if x.ndim == 3:
                x = x[None]
            h, w = x.shape[1:3]
            padded, _ = pad_to_multiple(x)
            out = self.eval_step(self.state.params, jnp.asarray(padded))
            x_hat = np.asarray(out["x_hat"])[:, :h, :w]
            mse = float(np.mean(np.square(x_hat - x)))
            psnr = 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))
            msssim = float(_ms_ssim(jnp.asarray(x_hat), jnp.asarray(x))) \
                if min(h, w) >= 176 else float("nan")
            # bpp_loss was computed over the padded extent; rescale the
            # bit count to the true pixel count like the reference does
            # when it pads (testing.py computes bpp over original pixels).
            bpp = float(out["bpp_loss"]) * (padded.shape[1] * padded.shape[2]) \
                / (h * w)
            row = {"psnr": psnr, "ms_ssim": msssim, "bpp": bpp,
                   "loss": float(out["loss"])}
            rows.append(row)
            for k, v in row.items():
                if not np.isnan(v):
                    totals[k] = totals.get(k, 0.0) + v
            if save_recon_dir is not None:
                import os

                from PIL import Image
                os.makedirs(save_recon_dir, exist_ok=True)
                rec = np.clip(x_hat[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
                Image.fromarray(rec).save(
                    f"{save_recon_dir}/{tag or 'val'}_img{i}.png")
            n += 1
        means = {k: v / max(n, 1) for k, v in totals.items()}
        means["per_image"] = rows
        return means
