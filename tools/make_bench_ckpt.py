"""Publish a training checkpoint as the bench default weights.

Strips a full train-state checkpoint (params + optimizer state) down to a
params-only orbax checkpoint at ``ckpts/bench_default`` so ``bench.py`` and
``tools/profile_codec.py`` measure trained-weight streams (random-init
streams are escape-heavy and ~10x the rate — VERDICT r1 weak #3).

``--bf16`` stores the params as bfloat16 (half the disk/git size — the
MLICPP_L tree is 334 MB in f32); ``load_matching`` casts back to the live
leaf dtype on load.  Entropy-parameter determinism is unaffected: the cast
is a one-time storage round trip of the weights, after which the restored
f32 values are identical on every load.

Usage: python tools/make_bench_ckpt.py ckpts/rd_l0483/checkpoint_20000 \
           [ckpts/bench_default_MLICPP_L] [--bf16]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(src: str, dst: str = "ckpts/bench_default", bf16: bool = False):
    import jax
    # disk->disk transform: keep it off the TPU (the axon plugin overrides
    # JAX_PLATFORMS; on-device casting would round-trip 334 MB of params
    # through the dev tunnel, and a co-running TPU job would wedge both)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    # numpy-typed restore: a StandardCheckpointer restore resolves the
    # SAVED sharding metadata, which names the TPU device and fails on the
    # CPU platform ("Device TPU v5 lite0 was not found")
    ck = ocp.PyTreeCheckpointer()
    meta = ck.metadata(os.path.abspath(src)).item_metadata
    ra = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray),
        getattr(meta, "tree", meta))
    raw = ck.restore(os.path.abspath(src), restore_args=ra)
    params = raw["params"] if "params" in raw else raw
    if bf16:
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16)), params)
    dst = os.path.abspath(dst)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    ck.save(dst, {"params": params})
    if hasattr(ck, "wait_until_finished"):
        ck.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {dst}: {n/1e6:.2f} M params"
          + (" (bfloat16 storage)" if bf16 else ""))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--bf16"]
    main(argv[0], *(argv[1:2] or []), bf16="--bf16" in sys.argv)
