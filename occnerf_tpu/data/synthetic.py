"""Synthetic subject generator.

Fabricates a complete on-disk subject in the exact pkl+png layout the
datasets consume (`cameras.pkl`, `mesh_infos.pkl`, `canonical_joints.pkl`,
``images/``, ``masks/``, `all_cameras.pkl`) from the synthetic SMPL model —
no licensed assets.  Used by the test-suite, ``bench.py`` and the
multi-chip dry run; it stands in for the offline prep tools' output
(`tools/prepare_zju_mocap/prepare_dataset.py:143-194`).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from ..smpl.model import SMPL, save_model, synthetic_smpl_model
from ..utils.image import save_image


def _look_at_extrinsics(campos: np.ndarray, lookat: np.ndarray) -> np.ndarray:
    from ..utils.camera import get_camrot
    R = get_camrot(campos.astype(np.float32), lookat.astype(np.float32))
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = -R @ campos
    return E


def _render_splat(verts: np.ndarray, K: np.ndarray, E: np.ndarray,
                  H: int, W: int, radius: int = 2,
                  texture_freq: float = 7.0):
    """Project vertices and splat discs — a cheap depth-less rasterizer
    good enough to give the pipeline real image/mask structure.
    ``texture_freq`` sets the spatial frequency of the per-vertex color
    field; high values (>= 50) give neighbouring vertices decorrelated
    colors, stressing hash-table capacity/collisions in quality A/Bs."""
    R, T = E[:3, :3], E[:3, 3]
    cam = verts @ R.T + T
    z = np.clip(cam[:, 2], 1e-4, None)
    uv = (cam[:, :2] / z[:, None])
    uv = uv @ K[:2, :2].T + K[:2, 2]
    img = np.zeros((H, W, 3), np.uint8)
    mask = np.zeros((H, W), np.uint8)
    u = np.round(uv[:, 0]).astype(int)
    v = np.round(uv[:, 1]).astype(int)
    keep = (u >= radius) & (u < W - radius) & (v >= radius) & (v < H - radius)
    u, v = u[keep], v[keep]
    col = (127 + 128 * np.abs(np.sin(verts[keep] * texture_freq))
           ).astype(np.uint8)
    for du in range(-radius, radius + 1):
        for dv in range(-radius, radius + 1):
            img[v + dv, u + du] = col
            mask[v + dv, u + du] = 255
    return img, mask


def make_synthetic_subject(out_dir: str, n_frames: int = 5,
                           img_size: int = 128, n_verts: int = 512,
                           seed: int = 0,
                           model_path: Optional[str] = None,
                           texture_freq: float = 7.0) -> str:
    """Write a synthetic subject dataset under ``out_dir``; returns path."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "masks"), exist_ok=True)

    if model_path is None:
        model_path = os.path.join(out_dir, "smpl_model.pkl")
        save_model(synthetic_smpl_model(n_verts=n_verts, seed=seed),
                   model_path)
    smpl = SMPL(model_path=model_path)

    H = W = img_size
    focal = img_size * 1.2
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float64)

    betas = rng.normal(0, 0.2, 10)
    _, tpose_joints = smpl(np.zeros(smpl.n_joints * 3), betas)
    # canonical body centered at origin
    canonical_joints = tpose_joints - tpose_joints[0:1]

    cameras, mesh_infos, all_cameras = {}, {}, {}
    for fi in range(n_frames):
        name = f"frame_{fi:06d}"
        pose = np.zeros(smpl.n_joints * 3)
        pose[3:] = rng.normal(0, 0.12, smpl.n_joints * 3 - 3)
        Rh = rng.normal(0, 0.1, 3)
        Th = rng.normal(0, 0.02, 3)

        verts, joints = smpl(pose, betas)

        campos = np.array([0.0, 0.0, 2.5 + 0.1 * fi])
        E = _look_at_extrinsics(campos, np.zeros(3))
        img, mask = _render_splat(verts, K, E, H, W,
                                  texture_freq=texture_freq)
        save_image(img, os.path.join(out_dir, "images", f"{name}.png"))
        save_image(np.stack([mask] * 3, -1),
                   os.path.join(out_dir, "masks", f"{name}.png"))

        cameras[name] = {"intrinsics": K.copy(), "extrinsics": E.copy()}
        mesh_infos[name] = {
            "Rh": Rh.astype(np.float32), "Th": Th.astype(np.float32),
            "poses": pose.astype(np.float32),
            "betas": betas.astype(np.float32),
            "joints": joints.astype(np.float32),
            "tpose_joints": tpose_joints.astype(np.float32),
        }
        # a small multi-view ring for the allview renderer
        views_K, views_E = [], []
        for vi in range(4):
            ang = 2 * np.pi * vi / 4
            cp = np.array([2.5 * np.sin(ang), 0.0, 2.5 * np.cos(ang)])
            views_K.append(np.vstack([np.hstack([K, np.zeros((3, 1))]),
                                      [0, 0, 0, 1]]))
            views_E.append(_look_at_extrinsics(cp, np.zeros(3)))
        all_cameras[name] = {"intrinsics": np.stack(views_K),
                             "extrinsics": np.stack(views_E)}

    with open(os.path.join(out_dir, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    with open(os.path.join(out_dir, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    with open(os.path.join(out_dir, "canonical_joints.pkl"), "wb") as f:
        pickle.dump({"joints": canonical_joints.astype(np.float32),
                     "avg_betas": betas.astype(np.float32)}, f)
    with open(os.path.join(out_dir, "all_cameras.pkl"), "wb") as f:
        pickle.dump(all_cameras, f)
    return out_dir
