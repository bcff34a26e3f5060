"""SMPL body math (host-side numpy).

Behavioral equivalents of the reference's `core/utils/body_util.py`:
joint tree, axis-angle -> per-joint local (R, T), canonical global
transforms, and the 25-channel Gaussian bone-volume prior
(`body_util.py:222-350`).  Vectorized rather than per-element loops.
"""

from __future__ import annotations

import numpy as np

SMPL_JOINT_IDX = {
    "pelvis_root": 0, "left_hip": 1, "right_hip": 2, "belly_button": 3,
    "left_knee": 4, "right_knee": 5, "lower_chest": 6, "left_ankle": 7,
    "right_ankle": 8, "upper_chest": 9, "left_toe": 10, "right_toe": 11,
    "neck": 12, "left_clavicle": 13, "right_clavicle": 14, "head": 15,
    "left_shoulder": 16, "right_shoulder": 17, "left_elbow": 18,
    "right_elbow": 19, "left_wrist": 20, "right_wrist": 21,
    "left_thumb": 22, "right_thumb": 23,
}

# child joint -> parent joint (joint 0 is the root)
SMPL_PARENT = {
    1: 0, 2: 0, 3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6, 10: 7,
    11: 8, 12: 9, 13: 9, 14: 9, 15: 12, 16: 13, 17: 14, 18: 16, 19: 17,
    20: 18, 21: 19, 22: 20, 23: 21,
}

# parent index per joint as an array (root's parent = itself)
SMPL_PARENT_ARRAY = np.array(
    [0] + [SMPL_PARENT[i] for i in range(1, 24)], dtype=np.int64)

TORSO_JOINTS = [SMPL_JOINT_IDX[n] for n in (
    "pelvis_root", "belly_button", "lower_chest", "upper_chest",
    "left_clavicle", "right_clavicle")]

BONE_STDS = np.array([0.03, 0.06, 0.03])
HEAD_STDS = np.array([0.06, 0.06, 0.06])
JOINT_STDS = np.array([0.02, 0.02, 0.02])


def skew(v: np.ndarray) -> np.ndarray:
    """Skew-symmetric cross-product matrices for (..., 3) vectors."""
    v = np.asarray(v)
    out = np.zeros(v.shape[:-1] + (3, 3), dtype=v.dtype)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    out[..., 0, 1], out[..., 0, 2] = -z, y
    out[..., 1, 0], out[..., 1, 2] = z, -x
    out[..., 2, 0], out[..., 2, 1] = -y, x
    return out


def rodrigues(rvecs: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Uses the same regularisation as the reference (`body_util.py:200-219`):
    theta = ||rvec||, axis = rvec / (theta + eps).
    """
    rvecs = np.asarray(rvecs, dtype=np.float64)
    theta = np.linalg.norm(rvecs, axis=-1, keepdims=True)
    axis = rvecs / (theta + eps)
    theta = theta[..., None]  # (..., 1, 1)
    K = skew(axis)
    eye = np.broadcast_to(np.eye(3), K.shape)
    outer = axis[..., :, None] * axis[..., None, :]
    R = np.cos(theta) * eye + np.sin(theta) * K + (1.0 - np.cos(theta)) * outer
    return R.astype(np.float32)


def rotation_between(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Rotation matrices aligning each v1 to v2 (batched, (N, 3) each).

    Rodrigues-free construction via R = I + K + K^2/(1+cos), as in
    `body_util.py:83-114`.  Degenerate for antiparallel vectors (same as
    the reference).
    """
    v1 = v1 / np.clip(np.linalg.norm(v1, axis=-1, keepdims=True), 1e-5, None)
    v2 = v2 / np.clip(np.linalg.norm(v2, axis=-1, keepdims=True), 1e-5, None)
    n = np.cross(v1, v2)
    cos_v = np.sum(v1 * v2, axis=-1)[:, None, None]
    K = skew(n)
    return (np.eye(3)[None] + K + K @ K / (1.0 + cos_v)).astype(np.float32)


def construct_G(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Stack (..., 3, 3) rotations and (..., 3) translations into 4x4s."""
    R = np.asarray(R)
    T = np.asarray(T)
    G = np.zeros(R.shape[:-2] + (4, 4), dtype=np.float32)
    G[..., :3, :3] = R
    G[..., :3, 3] = T
    G[..., 3, 3] = 1.0
    return G


def body_pose_to_body_RTs(jangles: np.ndarray,
                          tpose_joints: np.ndarray):
    """Axis-angle pose (J*3,) + rest joints (J, 3) -> local (Rs, Ts).

    Matches `body_util.py:222-248`: root T is the absolute root joint,
    non-root Ts are parent-relative offsets.
    """
    jangles = np.asarray(jangles).reshape(-1, 3)
    J = jangles.shape[0]
    assert tpose_joints.shape[0] == J
    Rs = rodrigues(jangles)
    Ts = np.empty((J, 3), dtype=np.float32)
    Ts[0] = tpose_joints[0]
    Ts[1:] = tpose_joints[1:] - tpose_joints[SMPL_PARENT_ARRAY[1:J]]
    return Rs, Ts


def get_canonical_global_tfms(canonical_joints: np.ndarray) -> np.ndarray:
    """Canonical joints (J, 3) -> global 4x4 transforms (`body_util.py:251-271`).

    Identity rotations; translations chained down the kinematic tree (which,
    for identity rotations, reduces to the absolute joint positions).
    """
    J = canonical_joints.shape[0]
    gtfms = np.zeros((J, 4, 4), dtype=np.float32)
    gtfms[0] = construct_G(np.eye(3), canonical_joints[0])
    for i in range(1, J):
        t = canonical_joints[i] - canonical_joints[SMPL_PARENT[i]]
        gtfms[i] = gtfms[SMPL_PARENT[i]] @ construct_G(np.eye(3), t)
    return gtfms


def _gaussian_volume(grid: np.ndarray, center: np.ndarray,
                     scale_mtx: np.ndarray, rot_mtx: np.ndarray) -> np.ndarray:
    """exp(-(x-c)^T R S S R^T (x-c)) over a precomputed grid (G,G,G,3)."""
    SIGMA = rot_mtx @ scale_mtx @ scale_mtx @ rot_mtx.T
    d = grid - center[None, None, None, :]
    dist = np.einsum("abci,ij,abcj->abc", d, SIGMA, d)
    return np.exp(-dist)


def _scale_from_stds(stds: np.ndarray) -> np.ndarray:
    return np.diag(1.0 / np.asarray(stds, dtype=np.float32))


def approx_gaussian_bone_volumes(tpose_joints: np.ndarray,
                                 bbox_min_xyz: np.ndarray,
                                 bbox_max_xyz: np.ndarray,
                                 grid_size: int = 32) -> np.ndarray:
    """25-channel (J bones + bg) Gaussian prior volume (J+1, G, G, G).

    Matches `body_util.py:274-350`: per-joint channel is the sum of Gaussian
    tubes along bones the joint parents (torso bones squashed 1.5x in x/z);
    leaf joints get an isotropic blob (bigger for the head).  Background =
    1 - sum, all normalized across channels.  Volume axes are ordered
    [z, y, x] with x fastest, exactly like the reference meshgrid
    (`body_util.py:167-171`).
    """
    tpose_joints = np.asarray(tpose_joints, dtype=np.float32)
    J = tpose_joints.shape[0]

    zg, yg, xg = np.meshgrid(
        np.linspace(bbox_min_xyz[2], bbox_max_xyz[2], grid_size),
        np.linspace(bbox_min_xyz[1], bbox_max_xyz[1], grid_size),
        np.linspace(bbox_min_xyz[0], bbox_max_xyz[0], grid_size),
        indexing="ij")
    grid = np.stack([xg, yg, zg], axis=-1).astype(np.float32)  # (G,G,G,3) xyz

    calibrated = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
    volumes = np.zeros((J,) + (grid_size,) * 3, dtype=np.float32)
    has_child = np.zeros(J, dtype=bool)

    for child, parent in SMPL_PARENT.items():
        if child >= J:
            continue
        S = _scale_from_stds(BONE_STDS * 2.0)
        if parent in TORSO_JOINTS:
            S[0, 0] /= 1.5
            S[2, 2] /= 1.5
        start, end = tpose_joints[parent], tpose_joints[child]
        R = rotation_between(calibrated, (end - start)[None])[0]
        center = (start + end) / 2.0
        volumes[parent] += _gaussian_volume(grid, center, S, R)
        has_child[parent] = True

    for j in range(J):
        if has_child[j]:
            continue
        stds = HEAD_STDS if j == SMPL_JOINT_IDX["head"] else JOINT_STDS
        volumes[j] = _gaussian_volume(
            grid, tpose_joints[j], _scale_from_stds(stds * 2.0),
            np.eye(3, dtype=np.float32))

    bg = 1.0 - np.clip(volumes.sum(axis=0, keepdims=True), 0.0, 1.0)
    out = np.concatenate([volumes, bg], axis=0)
    out /= np.clip(out.sum(axis=0, keepdims=True), 0.001, None)
    return out.astype(np.float32)
