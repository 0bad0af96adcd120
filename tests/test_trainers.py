"""Trainer-variant tests: dual-pass recompression, LR warmup, eval step."""

import jax
import jax.numpy as jnp
import numpy as np

from mlic_tpu.data.folder import synthetic_batches
from mlic_tpu.models.registry import get_model
from mlic_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_dual_train_step,
    make_eval_step,
    make_train_step,
)


def test_dual_train_step_runs_and_improves():
    model = get_model("MLICPP_TINY")
    cfg = TrainConfig(lmbda=0.013, learning_rate=3e-4)
    state, tx = create_train_state(model, cfg, input_shape=(2, 64, 64, 3))
    step = make_dual_train_step(model, tx, cfg)
    losses = []
    for batch in synthetic_batches(2, 64, steps=12, seed=2):
        state, m = step(state, jnp.asarray(batch))
        losses.append(float(m["loss"] + m["first_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_warmup_schedule_ramps_lr():
    model = get_model("MLICPP_TINY")
    cfg = TrainConfig(lmbda=0.013, learning_rate=1e-3, warmup_steps=10,
                      lr_milestones=(100,))
    state, tx = create_train_state(model, cfg, input_shape=(1, 64, 64, 3))
    step = make_train_step(model, tx, cfg)
    # After 2 steps the update magnitude should be much smaller than after 12
    # (LR ramps 0 -> 1e-3 over 10 steps).  Probe via param delta norms.
    import jax
    p0 = jax.tree.leaves(state.params)[0].copy()
    batch = next(synthetic_batches(1, 64, steps=1, seed=0))
    state, _ = step(state, jnp.asarray(batch))
    d_early = float(jnp.abs(jax.tree.leaves(state.params)[0] - p0).max())
    for _ in range(10):
        state, _ = step(state, jnp.asarray(batch))
    p1 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step(state, jnp.asarray(batch))
    d_late = float(jnp.abs(jax.tree.leaves(state.params)[0] - p1).max())
    assert d_early < d_late


def test_eval_step_reports_psnr():
    model = get_model("MLICPP_TINY")
    cfg = TrainConfig(lmbda=0.013)
    state, _ = create_train_state(model, cfg, input_shape=(1, 64, 64, 3))
    ev = make_eval_step(model, cfg)
    batch = next(synthetic_batches(1, 64, steps=1, seed=1))
    out = ev(state.params, jnp.asarray(batch))
    assert np.isfinite(float(out["psnr"]))
    assert out["x_hat"].shape == (1, 64, 64, 3)


def test_trainer_evaluate_full_images(tmp_path):
    """Trainer.evaluate: per-image PSNR/MS-SSIM/bpp rows over odd-sized
    full images (pad-to-64 inside, metrics on the true extent), recon dump
    (reference test_one_epoch, MLIC++/utils/testing.py:107-201)."""
    from mlic_tpu.train.trainer import Trainer

    model = get_model("MLICPP_TINY")
    tr = Trainer(model, TrainConfig(lmbda=0.013),
                 input_shape=(1, 64, 64, 3))
    rng = np.random.default_rng(3)
    imgs = [rng.random((70, 90, 3), np.float32),    # odd size -> padded
            rng.random((1, 64, 64, 3), np.float32)]  # batched form
    out = tr.evaluate(imgs, save_recon_dir=str(tmp_path), tag="t")
    assert len(out["per_image"]) == 2
    for row in out["per_image"]:
        assert np.isfinite(row["psnr"]) and np.isfinite(row["bpp"])
        assert np.isnan(row["ms_ssim"])  # below the 5-scale minimum size
    assert np.isfinite(out["psnr"]) and np.isfinite(out["loss"])
    assert (tmp_path / "t_img0.png").exists()
    from PIL import Image
    assert Image.open(tmp_path / "t_img0.png").size == (90, 70)
