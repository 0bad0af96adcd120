"""Compare per-image bpp distributions from statistics CSVs.

Equivalent of the reference's ``analysis/compare_bpp_distr.py``: load two
(or more) per-image CSVs produced by ``tools/statistics.py`` and report
distribution summaries + per-image deltas.
"""

from __future__ import annotations

import csv
from typing import Sequence

import numpy as np


def load_stats_csv(path: str) -> dict[str, dict[str, float]]:
    """CSV with header (name, bpp, ...) -> {name: {col: value}}."""
    out: dict[str, dict[str, float]] = {}
    with open(path) as f:
        reader = csv.DictReader(f)
        for row in reader:
            name = row.pop("name")
            out[name] = {k: float(v) for k, v in row.items() if v not in ("", None)}
    return out


def summarize(values: np.ndarray) -> dict:
    return {
        "mean": float(values.mean()), "std": float(values.std()),
        "min": float(values.min()), "p50": float(np.median(values)),
        "p90": float(np.percentile(values, 90)), "max": float(values.max()),
    }


def compare_bpp(paths: Sequence[str], column: str = "bpp") -> dict:
    """Distribution summary per file + pairwise per-image deltas on the
    intersection of image names."""
    stats = {p: load_stats_csv(p) for p in paths}
    result = {"summaries": {}, "deltas": {}}
    for p, rows in stats.items():
        vals = np.asarray([r[column] for r in rows.values()])
        result["summaries"][p] = summarize(vals)
    names = set.intersection(*(set(s) for s in stats.values())) if stats else set()
    paths = list(paths)
    for i in range(len(paths)):
        for j in range(i + 1, len(paths)):
            a, b = stats[paths[i]], stats[paths[j]]
            delta = np.asarray([a[n][column] - b[n][column] for n in sorted(names)])
            result["deltas"][(paths[i], paths[j])] = summarize(delta) if len(delta) else {}
    return result
