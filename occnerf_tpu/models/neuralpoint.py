"""Standalone multi-level neural point cloud.

Counterpart of the reference's dormant `core/nets/occnerf/neuralpoint.py`
(not imported by any active path there either — its ideas live inlined in
the network, `network.py:108-129`): a point cloud with per-point learnable
features, a farthest-point-sampling level pyramid, and multiscale KNN
queries.  Kept as a reusable library component; the active model composes
the same pieces directly (`occnerf_tpu/models/network.py`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.knn import knn, multiscale_knn
from ..utils.mesh import multiscale_fps_indices, vertex_normals


class NeuralPoint:
    """Multi-level point cloud with learnable per-point features.

    Statics (positions, normals, FPS pyramid) are built once on the host;
    features are a parameter pytree so the whole object stays jit-friendly.
    """

    def __init__(self, points: np.ndarray,
                 faces: Optional[np.ndarray] = None,
                 feature_dim: int = 32, levels: int = 3,
                 ratio: float = 0.25):
        self.n_points = int(points.shape[0])
        self.feature_dim = feature_dim
        self.points = jnp.asarray(points, jnp.float32)
        self.normals = (jnp.asarray(vertex_normals(points, faces),
                                    jnp.float32)
                        if faces is not None else None)
        self.fps_idx: List[jnp.ndarray] = [
            jnp.asarray(i, jnp.int32)
            for i in multiscale_fps_indices(points, levels=levels,
                                            ratio=ratio)]

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> Dict[str, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        return {
            "features": jax.random.normal(
                k1, (self.n_points, self.feature_dim), jnp.float32) * 0.01,
            # learnable per-point offset scalar, like the network's
            # point_dist (network.py:108-110)
            "point_dist": jax.random.uniform(
                k2, (self.n_points, 1), minval=-1e-4, maxval=1e-4),
        }

    def positions(self, params) -> jnp.ndarray:
        return self.points + params["point_dist"]

    # ------------------------------------------------------------------
    def query(self, params, queries: jnp.ndarray, k: int = 10,
              backend: str = "exact"
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Multiscale KNN feature aggregation.

        Returns (features (N, levels+1, k, F), indices (N, levels+1, k)).
        """
        idx = multiscale_knn(queries, self.points, self.fps_idx, k,
                             backend=backend)
        feats = params["features"][idx]
        return feats, idx

    def nearest_distance(self, queries: jnp.ndarray, k: int = 3,
                         backend: str = "exact") -> jnp.ndarray:
        """Mean distance to the k nearest base points (the unsigned part
        of the network's signed-distance computation)."""
        d, _ = knn(queries, self.points, k, backend=backend)
        return jnp.mean(d, axis=-1)
