"""Camera math (host-side numpy).

Behavioral equivalents of `core/utils/camera_util.py`: pinhole ray
generation in the OpenCV convention, slab-test ray/bbox intersection,
folding SMPL global (Rh, Th) into extrinsics, and the orbit camera used by
freeview-style renderers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _exact_rodrigues(rvec: np.ndarray) -> np.ndarray:
    """cv2.Rodrigues-equivalent axis-angle -> R (exact, no eps in axis)."""
    rvec = np.asarray(rvec, dtype=np.float64).reshape(3)
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3, dtype=np.float32)
    axis = rvec / theta
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    return R.astype(np.float32)


def update_extrinsics(extrinsics: np.ndarray, angle: float,
                      trans: Optional[np.ndarray] = None,
                      rotate_axis: str = "y") -> np.ndarray:
    """Rotate a camera about a world axis (reference `camera_util.py:5-49`).

    The sign of the angle flips when the camera's up-vector points down
    (`camera_util.py:29-31`) so orbits look consistent across datasets.
    """
    E = np.asarray(extrinsics, dtype=np.float64)
    inv_E = np.linalg.inv(E)
    camrot = inv_E[:3, :3]
    campos = inv_E[:3, 3].copy()
    if trans is not None:
        campos -= trans

    if camrot.T[1, 1] < 0.0:
        angle = -angle

    axis_idx = {"x": 0, "y": 1, "z": 2}[rotate_axis]
    rvec = np.zeros(3)
    rvec[axis_idx] = angle
    g = _exact_rodrigues(rvec).astype(np.float64)

    rot_campos = g @ campos
    rot_camrot = g @ camrot
    if trans is not None:
        rot_campos += trans

    new_E = np.eye(4)
    new_E[:3, :3] = rot_camrot.T
    new_E[:3, 3] = -rot_camrot.T @ rot_campos
    return new_E


def rotate_camera_by_frame_idx(extrinsics: np.ndarray, frame_idx: int,
                               trans: Optional[np.ndarray] = None,
                               rotate_axis: str = "y", period: int = 196,
                               inv_angle: bool = False) -> np.ndarray:
    """Orbit-camera extrinsics for a frame (reference `camera_util.py:85-110`)."""
    angle = 2 * np.pi * (frame_idx / period)
    if inv_angle:
        angle = -angle
    return update_extrinsics(extrinsics, angle, trans, rotate_axis)


def get_camrot(campos: np.ndarray, lookat: Optional[np.ndarray] = None,
               inv_camera: bool = False) -> np.ndarray:
    """Look-at rotation (rows = right/up/forward), `camera_util.py:52-82`."""
    if lookat is None:
        lookat = np.zeros(3, dtype=np.float32)
    up = np.array([0.0, -1.0 if inv_camera else 1.0, 0.0], dtype=np.float32)
    forward = lookat - campos
    forward = forward / np.linalg.norm(forward)
    right = np.cross(up, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    up = up / np.linalg.norm(up)
    return np.stack([right, up, forward]).astype(np.float32)


def apply_global_tfm_to_camera(E: np.ndarray, Rh: np.ndarray,
                               Th: np.ndarray) -> np.ndarray:
    """Fold SMPL global (Rh, Th) into extrinsics (`camera_util.py:113-130`)."""
    G = np.eye(4)
    R = _exact_rodrigues(np.asarray(Rh).reshape(3)).T
    G[:3, :3] = R
    G[:3, 3] = -R @ np.asarray(Th).reshape(3)
    return np.asarray(E) @ np.linalg.inv(G)


def get_rays_from_KRT(H: int, W: int, K: np.ndarray, R: np.ndarray,
                      T: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel rays in world space (OpenCV pinhole), `camera_util.py:133-160`.

    Directions are *not* normalized (the reference composits with
    dists * ||d||, so scale matters).
    """
    T = np.asarray(T, dtype=np.float64).ravel()
    rays_o = (-R.T @ T).ravel()
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = xy1 @ np.linalg.inv(K).T
    pixel_world = (pixel_camera - T) @ R
    rays_d = pixel_world - rays_o[None, None]
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def rays_intersect_3d_bbox(bounds, ray_o: np.ndarray, ray_d: np.ndarray,
                           use_mask: bool = True):
    """Slab-test ray/bbox intersection (`camera_util.py:163-212`).

    A ray is valid iff it hits exactly two of the six (margin-expanded)
    faces.  NOTE: like the reference, this clamps near-zero components of
    ``ray_d`` to 1e-5 *in place* — callers rely on consuming the clamped
    directions downstream.

    Returns (near, far, mask) with near/far only for valid rays.
    """
    if isinstance(bounds, dict):
        bounds = np.stack([bounds["min_xyz"], bounds["max_xyz"]], axis=0)
    bounds = np.asarray(bounds, dtype=np.float32)
    assert bounds.shape == (2, 3)

    bounds = bounds + np.array([-0.01, 0.01], dtype=np.float32)[:, None]
    ray_d[np.abs(ray_d) < 1e-5] = 1e-5  # in-place, as in the reference

    nominator = bounds[None] - ray_o[:, None]             # (N, 2, 3)
    d_intersect = (nominator / ray_d[:, None]).reshape(-1, 6)
    p_intersect = (d_intersect[..., None] * ray_d[:, None]
                   + ray_o[:, None])                       # (N, 6, 3)

    eps = 1e-6
    lo = bounds[0] - eps
    hi = bounds[1] + eps
    inside = np.all((p_intersect >= lo) & (p_intersect <= hi), axis=-1)  # (N,6)
    mask_at_box = inside.sum(-1) == 2

    if not use_mask:
        mask_at_box = np.ones_like(mask_at_box, dtype=bool)

    p_intervals = p_intersect[mask_at_box][inside[mask_at_box]].reshape(-1, 2, 3)
    sel_o = ray_o[mask_at_box]
    sel_d = ray_d[mask_at_box]
    norm_ray = np.linalg.norm(sel_d, axis=1)
    d0 = np.linalg.norm(p_intervals[:, 0] - sel_o, axis=1) / norm_ray
    d1 = np.linalg.norm(p_intervals[:, 1] - sel_o, axis=1) / norm_ray
    near = np.minimum(d0, d1)
    far = np.maximum(d0, d1)
    return near, far, mask_at_box
