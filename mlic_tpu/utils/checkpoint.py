"""Checkpoint save/restore with orbax.

Equivalent of the reference's ``save_checkpoint`` + resume logic
(``MLIC++/utils/utils.py:116-120``, ``playground/train.py:142-179``,
SURVEY.md §5.4): keeps epoch-numbered checkpoints plus a best-loss copy,
restores optimizer state, and supports partial (pretrained) loading with
shape filtering (cf. ``load_matching_state_dict``,
``mlicpp_small_decoder.py:485-510``).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep
        self.best_loss = float("inf")

    def _path(self, tag) -> str:
        return os.path.join(self.directory, f"checkpoint_{tag}")

    def save(self, tag, tree: Any, loss: Optional[float] = None, is_best: bool = False):
        path = self._path(tag)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(tree))
        self._ckpt.wait_until_finished()
        if loss is not None and (is_best or loss < self.best_loss):
            self.best_loss = min(self.best_loss, loss)
            best = self._path("best_loss")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
        self._gc()

    def restore(self, tag, target: Any) -> Any:
        """Restore into the structure of ``target`` (shapes must match)."""
        return self._ckpt.restore(self._path(tag), target=jax.device_get(target))

    def latest_tag(self) -> Optional[str]:
        tags = []
        for name in os.listdir(self.directory):
            if name.startswith("checkpoint_") and name != "checkpoint_best_loss":
                tags.append(name[len("checkpoint_"):])
        nums = sorted((int(t) for t in tags if t.isdigit()), reverse=True)
        return str(nums[0]) if nums else None

    def _gc(self):
        tags = sorted((int(t) for t in (n[len("checkpoint_"):]
                                        for n in os.listdir(self.directory)
                                        if n.startswith("checkpoint_"))
                       if t.isdigit()))
        for t in tags[:-self.max_to_keep] if len(tags) > self.max_to_keep else []:
            shutil.rmtree(self._path(str(t)), ignore_errors=True)


def load_matching(params: Any, pretrained: Any) -> Any:
    """Copy pretrained leaves whose path+shape match; keep others
    (shape-filtered partial load, reference ``mlicpp_small_decoder.py:485-506``)."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_q = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    out = {}
    for path, leaf in flat_p.items():
        cand = flat_q.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            # Cast to the target leaf's dtype: checkpoints may be stored
            # bfloat16 to halve disk size (tools/make_bench_ckpt.py --bf16),
            # while live params stay float32 (ModelConfig.transform_dtype
            # touches compute only; the entropy path REQUIRES f32 params).
            ld = np.asarray(leaf).dtype
            if np.asarray(cand).dtype != ld:
                cand = np.asarray(cand).astype(ld)
            out[path] = cand
        else:
            out[path] = leaf
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]])
