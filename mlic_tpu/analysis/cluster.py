"""Dataset clustering by frequency features.

Equivalent of the reference's ``analysis/cluster.py`` (MiniBatchKMeans over
per-image frequency-band features, PCA projection for inspection).  sklearn
is used when present; a compact numpy k-means fallback keeps the tool
dependency-light.
"""

from __future__ import annotations

import numpy as np

from mlic_tpu.analysis.freq import frequency_features


def _kmeans_np(x: np.ndarray, k: int, iters: int = 50, seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    labels = np.zeros(len(x), np.int64)
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        new_labels = d.argmin(1)
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
        for j in range(len(centers)):
            pts = x[labels == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return labels, centers


def cluster_images(images, k: int = 8, num_bands: int = 16, seed: int = 0) -> dict:
    """Cluster images by radial frequency-energy profile.

    Returns labels, cluster centers, and a 2-D PCA embedding of the
    (standardized) features for plotting.
    """
    feats = frequency_features(images, num_bands)
    mu, sigma = feats.mean(0), feats.std(0) + 1e-9
    z = (feats - mu) / sigma
    try:
        from sklearn.cluster import MiniBatchKMeans
        km = MiniBatchKMeans(n_clusters=k, random_state=seed, n_init=3)
        labels = km.fit_predict(z)
        centers = km.cluster_centers_
    except Exception:
        labels, centers = _kmeans_np(z, k, seed=seed)
    # 2-D PCA via SVD
    zc = z - z.mean(0)
    _, _, vt = np.linalg.svd(zc, full_matrices=False)
    embedding = zc @ vt[:2].T
    return {"labels": np.asarray(labels), "centers": np.asarray(centers),
            "embedding": embedding, "features": feats}
