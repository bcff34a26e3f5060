"""Shared helpers for the offline data-prep tools (host-side numpy)."""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np
import yaml

# tools run from anywhere; make the repo importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from occnerf_tpu.smpl.model import SMPL  # noqa: E402
from occnerf_tpu.utils.image import load_image  # noqa: E402


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def dump_pickle(obj, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def prepare_dir(output_path: str, name: str) -> str:
    out = os.path.join(output_path, name)
    os.makedirs(out, exist_ok=True)
    return out


def load_smpl_model(sex: str, model_dir: str) -> SMPL:
    return SMPL(sex=sex, model_dir=model_dir)


def da_pose(n_joints: int = 24) -> np.ndarray:
    """The 'da'-pose used for dapose_joints: legs spread via z-rotations of
    the hips (reference `tools/prepare_zju_mocap/prepare_dataset.py:152-156`)."""
    pose = np.zeros((n_joints, 3))
    pose[1, -1] = 1.0
    pose[2, -1] = -1.0
    return pose.reshape(-1)


def mesh_info_for(smpl_model: SMPL, poses: np.ndarray, betas: np.ndarray,
                  Rh: np.ndarray, Th: np.ndarray) -> dict:
    """Per-frame mesh info dict: posed/tpose/dapose joints from SMPL."""
    _, tpose_joints = smpl_model(np.zeros_like(poses), betas)
    _, dapose_joints = smpl_model(da_pose(smpl_model.n_joints), betas)
    _, joints = smpl_model(poses, betas)
    return {
        "Rh": np.asarray(Rh, np.float32),
        "Th": np.asarray(Th, np.float32),
        "poses": np.asarray(poses, np.float32),
        "betas": np.asarray(betas, np.float32),
        "joints": joints,
        "tpose_joints": tpose_joints,
        "dapose_joints": dapose_joints,
    }


def write_canonical_joints(output_path: str, smpl_model: SMPL,
                           all_betas: list) -> None:
    avg_betas = np.mean(np.stack(all_betas, axis=0), axis=0)
    _, template_joints = smpl_model(np.zeros(smpl_model.n_joints * 3),
                                    avg_betas)
    dump_pickle({"joints": template_joints, "avg_betas": avg_betas},
                os.path.join(output_path, "canonical_joints.pkl"))


def union_mask(subject_dir: str, img_rel_path: str) -> np.ndarray:
    """ZJU mask = union of `mask` and `mask_cihp` (reference
    `prepare_dataset.py:44-58`), binarized to {0, 255}."""
    base = img_rel_path[:-4] + ".png"
    m1 = np.array(load_image(os.path.join(subject_dir, "mask", base)))
    m2 = np.array(load_image(os.path.join(subject_dir, "mask_cihp", base)))
    msk = ((m1[:, :, 0] != 0) | (m2[:, :, 0] != 0)).astype(np.uint8) * 255
    return msk


def parse_view_spec(spec, max_cam: int = 22) -> np.ndarray:
    """'1-22' / '0, 3, 5-8' -> sorted camera index array."""
    views = []
    for part in str(spec).split(","):
        part = part.strip()
        if "-" in part[1:]:
            i = part.find("-", 1)
            views.extend(range(int(part[:i]), int(part[i + 1:]) + 1))
        else:
            v = int(part)
            if 0 <= v <= max_cam:
                views.append(v)
            else:
                print(f"eval view invalid! camera index {v} is given!")
    return np.asarray(views)
