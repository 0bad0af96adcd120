"""Strip encoder-side weights from a checkpoint, shipping decoder-only params
(reference ``MLIC++/submit/extract_model_state_dict.py:3-18``)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENCODER_PREFIXES = ("g_a", "h_a")


def strip_encoder(params: dict) -> dict:
    return {k: v for k, v in params.items() if k not in ENCODER_PREFIXES}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    tree = ckpt.restore(os.path.abspath(args.checkpoint))
    if "params" in tree:
        tree["params"] = strip_encoder(tree["params"])
    else:
        tree = strip_encoder(tree)
    out = os.path.abspath(args.out)
    ckpt.save(out, tree)
    ckpt.wait_until_finished()
    print(f"wrote decoder-only checkpoint to {out} "
          f"(dropped: {', '.join(ENCODER_PREFIXES)})")


if __name__ == "__main__":
    main()
