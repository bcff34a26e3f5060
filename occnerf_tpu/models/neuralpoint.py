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

    # ------------------------------------------------------------------
    # voxel-bucketed fast KNN (reference neuralpoint.py:114-199: a res^3
    # grid whose cells precompute candidate neighbours; queries then run
    # exact KNN against their cell's candidates only)
    # ------------------------------------------------------------------
    def fast_knn_preprocess(self, res: int = 100, num: int = 30) -> None:
        """Precompute, per grid cell and per FPS level, the ``num``
        nearest cloud points to the cell centre.  One-time host cost
        O(res^3 * V); queries become O(num) instead of O(V)."""
        pts = np.asarray(self.points)
        self.res = int(res)
        self.num_candidates = int(num)
        self.mmin = jnp.asarray(pts.min(axis=0) - 0.05)
        self.mmax = jnp.asarray(pts.max(axis=0) + 0.05)

        step = (np.asarray(self.mmax) - np.asarray(self.mmin)) / res
        axes = [np.asarray(self.mmin)[d] + step[d] * np.arange(res)
                for d in range(3)]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        centres = jnp.asarray(
            np.stack([gx, gy, gz], axis=-1).reshape(-1, 3), jnp.float32)

        self.index_book: List[jnp.ndarray] = []
        for level_idx in [None] + list(range(len(self.fps_idx))):
            cloud = (self.points if level_idx is None
                     else self.points[self.fps_idx[level_idx]])
            kk = min(num, cloud.shape[0])
            _, idx = knn(centres, cloud, kk, backend="exact")
            self.index_book.append(idx)                   # (res^3, num)

    def fast_knn(self, queries: jnp.ndarray, level: int, k: int
                 ) -> jnp.ndarray:
        """Approximate k-NN of ``queries`` into FPS level ``level``
        (-1 = base cloud) using only the precomputed per-cell candidates.
        Returns (N, k) indices into that level's cloud."""
        assert hasattr(self, "index_book"), "run fast_knn_preprocess first"
        book = self.index_book[level + 1]
        cloud = (self.points if level < 0
                 else self.points[self.fps_idx[level]])
        step = (self.mmax - self.mmin) / self.res
        cell = jnp.clip(jnp.floor((queries - self.mmin) / step),
                        0, self.res - 1).astype(jnp.int32)     # (N, 3)
        flat = (cell[:, 0] * self.res + cell[:, 1]) * self.res + cell[:, 2]
        cand = book[flat]                                      # (N, num)
        cpts = cloud[cand]                                     # (N, num, 3)
        d2 = jnp.sum((queries[:, None, :] - cpts) ** 2, axis=-1)
        _, local = jax.lax.top_k(-d2, k)                       # (N, k)
        return jnp.take_along_axis(cand, local, axis=1)
