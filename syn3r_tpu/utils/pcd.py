"""Point-cloud utilities shared by the pipeline and CLI layers."""

from __future__ import annotations

import numpy as np


def remove_statistical_outliers(xyz: np.ndarray, rgb: np.ndarray,
                                k: int = 8, std_ratio: float = 2.0):
    """open3d remove_statistical_outlier equivalent via the KNN op
    (reference post-process, diffusionGS.py:323-327 uses
    nb_neighbors=20, std_ratio=3.0)."""
    import jax.numpy as jnp

    from ..ops.knn import knn_sq_dists

    if len(xyz) <= k:
        return xyz, rgb
    d = np.sqrt(np.asarray(knn_sq_dists(jnp.asarray(xyz, jnp.float32), k=k)))
    mean_d = d.mean(axis=1)
    keep = mean_d < mean_d.mean() + std_ratio * mean_d.std()
    return xyz[keep], rgb[keep]
