"""Frequency-domain dataset analysis.

Equivalent of the reference's ``analysis/freq_ana.py`` /
``freq_ana_multiprocess.py`` (FFT magnitude spectra, normalized frequency
grids, radial band-energy histograms over a dataset) re-expressed in
vectorized numpy.  The multiprocessing Pool of the reference is replaced by
straightforward batched numpy (the FFTs dominate; no fork overhead needed).
"""

from __future__ import annotations

import numpy as np


def frequency_energy(image: np.ndarray) -> np.ndarray:
    """Centered FFT magnitude spectrum of a grayscale image [H,W]."""
    return np.abs(np.fft.fftshift(np.fft.fft2(image.astype(np.float64))))


def normalized_spectrum(magnitude: np.ndarray, grid: int = 256) -> np.ndarray:
    """Resample a magnitude spectrum onto a [grid, grid] unit-frequency grid
    ([-0.5, 0.5]^2) so spectra of different-size images are comparable."""
    h, w = magnitude.shape
    yi = np.clip((np.linspace(0, 1, grid) * (h - 1)).round().astype(int), 0, h - 1)
    xi = np.clip((np.linspace(0, 1, grid) * (w - 1)).round().astype(int), 0, w - 1)
    return magnitude[np.ix_(yi, xi)]


def band_energies(magnitude: np.ndarray, num_bands: int = 10) -> np.ndarray:
    """Energy fraction per radial frequency band (annuli around DC)."""
    h, w = magnitude.shape
    cy, cx = h / 2.0, w / 2.0
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt(((yy - cy) / h) ** 2 + ((xx - cx) / w) ** 2)  # [0, ~0.707]
    edges = np.linspace(0, r.max() + 1e-9, num_bands + 1)
    power = magnitude.astype(np.float64) ** 2
    total = power.sum()
    out = np.empty(num_bands)
    for i in range(num_bands):
        mask = (r >= edges[i]) & (r < edges[i + 1])
        out[i] = power[mask].sum() / max(total, 1e-12)
    return out


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """[H,W,3] (or [H,W]) uint8/float -> grayscale float [H,W] (Rec.601)."""
    if img.ndim == 2:
        return img.astype(np.float64)
    w = np.asarray([0.299, 0.587, 0.114])
    return img[..., :3].astype(np.float64) @ w


def dataset_band_profile(images, num_bands: int = 10) -> dict:
    """Per-image band energies + dataset mean/std (the histogram the
    reference plots over a training set)."""
    rows = []
    for img in images:
        rows.append(band_energies(frequency_energy(to_grayscale(img)), num_bands))
    arr = np.stack(rows)
    return {"per_image": arr, "mean": arr.mean(0), "std": arr.std(0)}


def frequency_features(images, num_bands: int = 16) -> np.ndarray:
    """Feature matrix [n_images, num_bands] for clustering (``cluster.py``)."""
    return np.stack([
        band_energies(frequency_energy(to_grayscale(img)), num_bands)
        for img in images])
