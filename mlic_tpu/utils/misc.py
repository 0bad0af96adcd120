"""Small utilities mirrored from the reference's ``utils/utils.py`` /
``utils/func.py``: attr-dict config, running averages, patch reshapes,
hardware banner, pretty metric tables."""

from __future__ import annotations

import json
import platform
from typing import Any

import numpy as np


class Config(dict):
    """Attribute-style dict with JSON load/save (reference ``utils.py:17-25``)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def from_json(cls, path: str) -> "Config":
        with open(path) as f:
            return cls(json.load(f))

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self, f, indent=2, default=str)


class AverageMeter:
    """Running average (reference ``utils.py:90-103``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def image_to_patches(x: np.ndarray, patch: int) -> np.ndarray:
    """[B,H,W,C] -> [B*nh*nw, p, p, C] (reference ``func.py:122-130``)."""
    b, h, w, c = x.shape
    nh, nw = h // patch, w // patch
    x = x[:, :nh * patch, :nw * patch]
    return (x.reshape(b, nh, patch, nw, patch, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b * nh * nw, patch, patch, c))


def patches_to_image(p: np.ndarray, grid_hw: tuple[int, int]) -> np.ndarray:
    """Inverse of image_to_patches (reference ``func.py:132-138``)."""
    nh, nw = grid_hw
    n, ph, pw, c = p.shape
    b = n // (nh * nw)
    return (p.reshape(b, nh, nw, ph, pw, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, nh * ph, nw * pw, c))


def get_system_info_str() -> str:
    """Hardware/runtime banner (reference ``utils.py:138-212``)."""
    lines = [
        f"platform : {platform.platform()}",
        f"python   : {platform.python_version()}",
    ]
    try:
        import jax
        lines.append(f"jax      : {jax.__version__}")
        lines.append(f"devices  : {[str(d) for d in jax.devices()]}")
        lines.append(f"processes: {jax.process_count()}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax      : unavailable ({e})")
    try:
        with open("/proc/meminfo") as f:
            total_kb = int(f.readline().split()[1])
        lines.append(f"host mem : {total_kb / 1e6:.1f} GB")
    except OSError:
        pass
    return "\n".join(lines)


def pretty_print_dict(metrics: dict[str, Any], precision: int = 4) -> str:
    """Aligned key/value table (reference ``utils.py:235-238``)."""
    keys = [str(k) for k in metrics]
    width = max((len(k) for k in keys), default=0)
    rows = []
    for k, v in metrics.items():
        if isinstance(v, float):
            v = f"{v:.{precision}f}"
        rows.append(f"{str(k):<{width}} : {v}")
    return "\n".join(rows)
