"""VBR multi-rate training: MGDA with a Frank-Wolfe min-norm solver.

Reference: ``VBRTrainer`` (``MLIC++/playground/compression_trainer.py:333-730``)
runs one forward/backward per gain level, snapshots shared-parameter grads,
solves min-norm Frank-Wolfe over the stacked gradients, scatters the combined
gradient back, and manually all-reduces (``:554-593``).

TPU restructuring: ONE jitted step — ``lax.map`` over the level index
(traced ``s`` indexes the Gain vector and the lambda table, so the model
body is traced once, not per level), per-leaf einsums build the Gram matrix
without flattening, the Frank-Wolfe iteration is pure jnp, and the gradient
all-reduce falls out of jit partitioning over the data mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mlic_tpu.loss import rate_distortion_loss
from mlic_tpu.models.vbr import MLICPlusPlusVbr
from mlic_tpu.train.trainer import TrainConfig, TrainState


def frank_wolfe_minnorm(gram: jax.Array, n_iters: int = 20) -> jax.Array:
    """Min-norm point in the convex hull of gradients, given the Gram matrix.

    Solves min_alpha ||sum_i alpha_i g_i||^2 over the simplex with
    Frank-Wolfe + exact (quadratic) line search — the solver of
    ``compression_trainer.py:353-427`` in pure jnp.
    """
    L = gram.shape[0]
    alpha0 = jnp.full((L,), 1.0 / L, gram.dtype)

    def body(alpha, _):
        grad = gram @ alpha
        idx = jnp.argmin(grad)
        direction = jax.nn.one_hot(idx, L, dtype=gram.dtype) - alpha
        denom = direction @ gram @ direction
        gamma = jnp.clip(-(alpha @ gram @ direction) / (denom + 1e-12), 0.0, 1.0)
        gamma = jnp.where(denom <= 1e-12, 0.0, gamma)
        return alpha + gamma * direction, None

    alpha, _ = jax.lax.scan(body, alpha0, None, length=n_iters)
    return alpha


def _is_gain(path) -> bool:
    return any(getattr(k, "key", None) == "Gain" for k in path)


def make_vbr_train_step(model: MLICPlusPlusVbr, tx: optax.GradientTransformation,
                        cfg: TrainConfig, gradnorm: str = "none") -> Callable:
    """Jitted (state, batch) -> (state, metrics) training all levels at once.

    ``gradnorm="loss"`` enables MGDA-UB-style per-level normalization: each
    level's shared gradient is scaled by 1/loss_s before the Gram matrix and
    the combined direction.  Without it the high-lambda levels (whose raw RD
    losses are an order of magnitude larger early in training) dominate the
    min-norm direction, and the r3 run's quality tail saturated (~0.25 dB
    across the top four levels, results/rd_vbr.json r3) — the same imbalance
    the reference's per-level manual loop is exposed to but never corrects
    (``compression_trainer.py:515-593``).
    """
    lmbdas = jnp.asarray(model.cfg.lmbda, jnp.float32)
    n_levels = len(model.cfg.lmbda)

    def level_loss(params, batch, noise_rng, s):
        out = model.apply({"params": params}, batch, True, 2, s,
                          rngs={"noise": noise_rng})
        rd = rate_distortion_loss(out, batch, lmbdas[s], cfg.metric)
        aux = model.apply({"params": params}, method=MLICPlusPlusVbr.aux_loss)
        return rd["loss"] + aux, rd

    @jax.jit
    def train_step(state: TrainState, batch: jax.Array):
        rng, noise_rng = jax.random.split(state.rng)

        def per_level(s):
            grads, rd = jax.grad(level_loss, has_aux=True)(
                state.params, batch, noise_rng, s)
            return grads, rd["loss"], rd["bpp_loss"]

        grads_stack, losses, bpps = jax.lax.map(per_level, jnp.arange(n_levels))

        # Per-level scale for the SHARED gradients: MGDA-UB (1/loss_s) when
        # enabled, identity otherwise.  Gain grads are never scaled — they
        # train per-level outside the min-norm combination.
        if gradnorm == "loss":
            scale = 1.0 / jnp.maximum(losses, 1e-6)
        else:
            scale = jnp.ones((n_levels,), jnp.float32)

        def _scaled(g):
            return g * scale.reshape((n_levels,) + (1,) * (g.ndim - 1))

        # Gram matrix of the SHARED gradients (Gain excluded — it trains
        # per-level, reference mlicpp_vbr.py:1138-1148).
        flat = jax.tree_util.tree_flatten_with_path(grads_stack)[0]
        gram = jnp.zeros((n_levels, n_levels), jnp.float32)
        for path, g in flat:
            if _is_gain(path):
                continue
            g = _scaled(g)
            gram = gram + jnp.einsum("i...,j...->ij", g, g)
        alpha = frank_wolfe_minnorm(gram)

        def combine(path, g):
            if _is_gain(path):
                return jnp.sum(g, axis=0)        # per-level gain grads, summed
            # MGDA-combined shared grad over the (scaled) per-level grads
            return jnp.tensordot(alpha, _scaled(g), axes=1)

        grads = jax.tree_util.tree_map_with_path(combine, grads_stack)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": jnp.mean(losses),
            "bpp_loss": jnp.mean(bpps),
            "loss_per_level": losses,
            "bpp_per_level": bpps,
            "alpha": alpha,
        }
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), metrics

    return train_step
