"""Optimizer construction: main/aux parameter split.

Reference splits parameters by the ``.quantiles`` suffix into a main Adam and
an auxiliary Adam (``MLIC++/utils/optimizers.py:6-45``); here the same split
is an optax ``multi_transform`` inside ONE fused update — the quantile
parameters receive gradients only from the aux loss (density params are
stop-gradded there) and nothing else, so a single backward pass serves both
optimizers (cf. the reference's two backward passes,
``MLIC++/utils/training.py:73-84``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax


def param_labels(params: Any) -> Any:
    """'aux' for entropy-bottleneck quantiles, 'main' for everything else."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path) -> str:
        names = [getattr(k, "key", getattr(k, "idx", "")) for k in path]
        return "aux" if "quantiles" in names else "main"

    labeled = {jax.tree_util.keystr(path): label_of(path) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: labeled[jax.tree_util.keystr(path)], params)


def make_optimizer(
    learning_rate: float | Callable = 1e-4,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
    optimizer: str = "adam",
) -> optax.GradientTransformation:
    if optimizer == "adam":
        main_opt = optax.adam(learning_rate)
    elif optimizer == "adamw":
        main_opt = optax.adamw(learning_rate)
    elif optimizer == "sgd":
        main_opt = optax.sgd(learning_rate, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    main = optax.chain(
        optax.clip_by_global_norm(clip_max_norm) if clip_max_norm else optax.identity(),
        main_opt,
    )
    aux = optax.adam(aux_learning_rate)
    return optax.multi_transform({"main": main, "aux": aux}, param_labels)


def freeze(tx: optax.GradientTransformation,
           pattern: str) -> optax.GradientTransformation:
    """Zero the updates of every parameter whose flax path matches ``pattern``
    (regex, searched against e.g. ``"['g_a']['conv_0']['kernel']"``).

    Equivalent of the reference's ``frezze_some_layers`` requires_grad=False
    loop (``MLIC++/models/mlicpp_small_decoder.py:508-517``): frozen leaves
    keep their values; optimizer state still exists but their update is
    masked to zero inside the fused step.
    """
    import re

    rx = re.compile(pattern)

    def mask_like(updates):
        def m(path, u):
            return jax.numpy.zeros_like(u) if rx.search(
                jax.tree_util.keystr(path)) else u
        return jax.tree_util.tree_map_with_path(m, updates)

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        updates, state = tx.update(grads, state, params)
        return mask_like(updates), state

    return optax.GradientTransformation(init, update)


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    """torch MultiStepLR equivalent as an optax schedule (step-indexed)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones})
