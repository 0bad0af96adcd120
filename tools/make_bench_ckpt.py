"""Publish a training checkpoint as the bench default weights.

Strips a full train-state checkpoint (params + optimizer state) down to a
params-only orbax checkpoint at ``ckpts/bench_default`` so ``bench.py`` and
``tools/profile_codec.py`` measure trained-weight streams (random-init
streams are escape-heavy and ~10x the rate — VERDICT r1 weak #3).

Usage: python tools/make_bench_ckpt.py ckpts/rd_l0483/checkpoint_20000
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(src: str, dst: str = "ckpts/bench_default"):
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    raw = ck.restore(os.path.abspath(src))
    params = raw["params"] if "params" in raw else raw
    dst = os.path.abspath(dst)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    ck.save(dst, {"params": params})
    ck.wait_until_finished()
    import jax
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {dst}: {n/1e6:.2f} M params")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
