"""Per-subject on-disk metadata (host-side).

Loads the same pkl+png dataset layout the reference consumes
(`core/data/occnerf/train.py:97-139`): ``cameras.pkl`` (per-frame K/E/D),
``mesh_infos.pkl`` (per-frame Rh/Th/poses/betas/joints/tpose_joints),
``canonical_joints.pkl`` (canonical joints + ``avg_betas``), ``images/*.png``
and ``masks/*.png``.  Shared by every dataset class.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from ..config import cfg
from ..utils.body import approx_gaussian_bone_volumes
from ..utils.files import list_files, split_path


def skeleton_to_bbox(skeleton: np.ndarray, bbox_offset: float) -> Dict:
    """Joint positions -> axis-aligned bbox with margin
    (`core/data/occnerf/train.py:115-122`)."""
    return {
        "min_xyz": np.min(skeleton, axis=0) - bbox_offset,
        "max_xyz": np.max(skeleton, axis=0) + bbox_offset,
    }


class SubjectData:
    """All per-subject static metadata, loaded once."""

    def __init__(self, dataset_path: str, bbox_offset: Optional[float] = None,
                 mweight_volume_size: Optional[int] = None):
        self.dataset_path = dataset_path
        self.image_dir = os.path.join(dataset_path, "images")
        self.mask_dir = os.path.join(dataset_path, "masks")
        self.bbox_offset = (bbox_offset if bbox_offset is not None
                            else cfg.bbox_offset)
        grid = (mweight_volume_size if mweight_volume_size is not None
                else cfg.mweight_volume.volume_size)

        with open(os.path.join(dataset_path, "canonical_joints.pkl"),
                  "rb") as f:
            cl = pickle.load(f)
        self.canonical_joints = cl["joints"].astype(np.float32)
        self.avg_betas = cl["avg_betas"].astype(np.float32)
        self.canonical_bbox = skeleton_to_bbox(self.canonical_joints,
                                               self.bbox_offset)

        with open(os.path.join(dataset_path, "cameras.pkl"), "rb") as f:
            self.cameras = pickle.load(f)

        with open(os.path.join(dataset_path, "mesh_infos.pkl"), "rb") as f:
            self.mesh_infos = pickle.load(f)
        for name, info in self.mesh_infos.items():
            info["bbox"] = skeleton_to_bbox(info["joints"], self.bbox_offset)

        self.motion_weights_priors = approx_gaussian_bone_volumes(
            self.canonical_joints,
            self.canonical_bbox["min_xyz"],
            self.canonical_bbox["max_xyz"],
            grid_size=grid).astype(np.float32)

    # ------------------------------------------------------------------
    def frame_list(self) -> List[str]:
        paths = list_files(self.image_dir, exts=[".png"])
        return [split_path(p)[1] for p in paths]

    def skeleton(self, frame_name: str) -> Dict:
        """Per-frame skeleton info dict (`train.py:140-156`)."""
        info = self.mesh_infos[frame_name]
        out = {
            "poses": info["poses"].astype(np.float32),
            "betas": info["betas"].astype(np.float32),
            "dst_tpose_joints": info["tpose_joints"].astype(np.float32),
            "joints": info["joints"].astype(np.float32),
            "bbox": {k: v.copy() for k, v in info["bbox"].items()},
            "Rh": info["Rh"].astype(np.float32),
            "Th": info["Th"].astype(np.float32),
        }
        if "trans" in info:
            out["trans"] = info["trans"].astype(np.float32)
        return out

    def cnl_bbox_arrays(self):
        min_xyz = self.canonical_bbox["min_xyz"].astype(np.float32)
        max_xyz = self.canonical_bbox["max_xyz"].astype(np.float32)
        return {
            "cnl_bbox_min_xyz": min_xyz,
            "cnl_bbox_max_xyz": max_xyz,
            "cnl_bbox_scale_xyz": (2.0 / (max_xyz - min_xyz)).astype(
                np.float32),
        }
