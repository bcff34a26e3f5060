"""Mesh and point-cloud utilities (host-side numpy).

Replaces the reference's external native deps: trimesh vertex normals
(`core/nets/occnerf/network.py:94-98`) and torch_cluster farthest-point
sampling (`network.py:113-118`).
"""

from __future__ import annotations

import numpy as np


def face_normals(verts: np.ndarray, faces: np.ndarray,
                 normalize: bool = True) -> np.ndarray:
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    if normalize:
        n = n / np.clip(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12, None)
    return n


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals.

    Each vertex accumulates the unnormalized (area-weighted) normals of its
    incident faces, then normalizes — the standard construction trimesh
    exposes as ``Trimesh.vertex_normals`` in the reference.
    """
    fn = face_normals(verts, faces, normalize=False)  # area-weighted
    vn = np.zeros_like(verts, dtype=np.float64)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norms = np.linalg.norm(vn, axis=-1, keepdims=True)
    vn = np.where(norms > 1e-12, vn / np.clip(norms, 1e-12, None), vn)
    return vn.astype(np.float32)


def estimate_pointcloud_normals(points: np.ndarray,
                                neighborhood_size: int = 10) -> np.ndarray:
    """PCA normals of a raw point cloud (no mesh).

    Equivalent of the pytorch3d ``estimate_pointcloud_normals`` the
    reference imports (`core/nets/occnerf/network.py:25,162`) but only
    exercises marginally (the active path uses mesh vertex normals): the
    normal of each point is the smallest-eigenvalue eigenvector of its
    k-neighborhood covariance.  Sign is left unoriented, like pytorch3d.
    """
    points = np.asarray(points, dtype=np.float64)
    n = points.shape[0]
    k = min(neighborhood_size, n)
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
    neigh = points[idx]                                  # (N, k, 3)
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)                        # ascending eigvals
    return vecs[:, :, 0].astype(np.float32)


def farthest_point_sampling(points: np.ndarray, ratio: float | None = None,
                            n_samples: int | None = None,
                            start_idx: int = 0) -> np.ndarray:
    """Deterministic farthest-point sampling; returns selected indices.

    Replaces ``torch_cluster.fps(ratio=...)`` (`network.py:117`).  The
    reference uses a random start; we pin ``start_idx`` for reproducibility
    (FPS output is insensitive to the seed beyond the first pick).
    """
    points = np.asarray(points, dtype=np.float64)
    N = points.shape[0]
    if n_samples is None:
        assert ratio is not None
        n_samples = int(np.ceil(N * ratio))
    n_samples = min(n_samples, N)

    selected = np.empty(n_samples, dtype=np.int64)
    selected[0] = start_idx
    min_d2 = np.sum((points - points[start_idx]) ** 2, axis=-1)
    for i in range(1, n_samples):
        idx = int(np.argmax(min_d2))
        selected[i] = idx
        d2 = np.sum((points - points[idx]) ** 2, axis=-1)
        np.minimum(min_d2, d2, out=min_d2)
    return selected


def multiscale_fps_indices(points: np.ndarray, levels: int = 3,
                           ratio: float = 0.25) -> list[np.ndarray]:
    """Reference's 3-level FPS pyramid (`network.py:113-118`): each level
    samples ``ratio**level_i`` of the *base* cloud (1/4, 1/16, 1/64)."""
    out = []
    r = 1.0
    for _ in range(levels):
        r *= ratio
        out.append(farthest_point_sampling(points, ratio=r))
    return out
