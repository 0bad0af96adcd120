"""Bjøntegaard-delta metrics + RD-curve comparison against the reference's
published anchors (``/root/reference/results/*/*.json``).

Implements the standard BD-rate / BD-PSNR construction (cubic polynomial fit
of PSNR vs log-rate, integrated over the overlapping range).  Usage:

  python tools/bdrate.py --test my_curve.json --anchor \
      /root/reference/results/kodak/mlicplusplus_mse.json

Curve JSON format matches the reference results files:
  {"results": {"bpp": [...], "psnr-rgb" or "psnr": [...]}} or flat lists.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _load_curve(path: str):
    with open(path) as f:
        data = json.load(f)
    if "results" in data:
        data = data["results"]
    bpp = np.asarray(data["bpp"], dtype=np.float64)
    for key in ("psnr", "psnr-rgb", "PSNR"):
        if key in data:
            psnr = np.asarray(data[key], dtype=np.float64)
            break
    else:
        raise KeyError(f"no psnr field in {path}: {sorted(data)}")
    order = np.argsort(bpp)
    return bpp[order], psnr[order]


def bd_rate(anchor_bpp, anchor_psnr, test_bpp, test_psnr) -> float:
    """BD-rate in percent (negative = test needs fewer bits than anchor)."""
    la, lt = np.log(anchor_bpp), np.log(test_bpp)
    pa = np.polyfit(anchor_psnr, la, 3)
    pt = np.polyfit(test_psnr, lt, 3)
    lo = max(anchor_psnr.min(), test_psnr.min())
    hi = min(anchor_psnr.max(), test_psnr.max())
    if hi <= lo:
        raise ValueError("no PSNR overlap between curves")
    ia = np.polyint(pa)
    it = np.polyint(pt)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float((np.exp(avg_t - avg_a) - 1.0) * 100.0)


def bd_psnr(anchor_bpp, anchor_psnr, test_bpp, test_psnr) -> float:
    """BD-PSNR in dB (positive = test better at equal rate)."""
    la, lt = np.log(anchor_bpp), np.log(test_bpp)
    pa = np.polyfit(la, anchor_psnr, 3)
    pt = np.polyfit(lt, test_psnr, 3)
    lo = max(la.min(), lt.min())
    hi = min(la.max(), lt.max())
    if hi <= lo:
        raise ValueError("no rate overlap between curves")
    ia = np.polyint(pa)
    it = np.polyint(pt)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float(avg_t - avg_a)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--test", required=True, help="test RD curve json")
    p.add_argument("--anchor", required=True, help="anchor RD curve json")
    args = p.parse_args(argv)
    ab, ap = _load_curve(args.anchor)
    tb, tp = _load_curve(args.test)
    print(f"BD-rate : {bd_rate(ab, ap, tb, tp):+.2f} %  (negative = better)")
    print(f"BD-PSNR : {bd_psnr(ab, ap, tb, tp):+.3f} dB (positive = better)")


if __name__ == "__main__":
    main()
